"""Repackage published atomic data tables into cmacionize_tpu/data/*.npz.

Sources (published scientific data, not code):
- Verner & Yakovlev 1995, A&AS 109, 125 (photoionization fit parameters,
  files verner_A.dat / verner_B.dat / verner_C.dat as distributed from
  http://www.pa.uky.edu/~verner/photo.html; mounted read-only at
  /root/reference/data/)
- Verner & Ferland 1996, ApJS 103, 467 (radiative recombination rate fit
  parameters, verner_rec_data.txt, from the published rrfit routine data)

Run once at development time; the generated .npz files are committed so the
framework is standalone.  Layout:

verner_photo.npz:
    a_params   [31, 31, 8, 7]  per (Z, N, shell): E_th, E_0, sigma_0, y_a,
                               P, y_w, l  (eV / eV / Mb / - / - / - / -);
                               zeros where no entry exists
    b_params   [31, 31, 9]     per (Z, N): E_th, E_max, E_0, sigma_0, y_a,
                               P, y_w, y_0, y_1
    c_params   [31, 2]         per N: (N_inn, N_tot)

verner_rec.npz:
    rrec [2, 31, 31]   power-law fit: rate = rrec0 * (T/1e4K)^-rrec1 (cm^3/s)
    rnew [4, 31, 31]   4-parameter fit: A, B, T0, T1
    fe   [3, 14]       low-charge iron fits
(index [Z, N] with 1-based Z/N directly; row/col 0 unused)
"""

import os
import sys

import numpy as np

REF_DATA = "/root/reference/data"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cmacionize_tpu",
    "data",
)


def shell_number(n, l):
    """Combine principal/orbital quantum numbers into Verner's shell index,
    cf. the shell numbering in the published phfit2 routine."""
    if n < 3:
        return n + l
    n += 1
    if n < 5:
        return n + l
    return n + 2


def repackage_photo():
    a_params = np.zeros((31, 31, 8, 7))
    with open(os.path.join(REF_DATA, "verner_A.dat")) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            Z, N, n, l = (int(p) for p in parts[:4])
            E_th, E_0, sigma_0, y_a, P, y_w = (float(p) for p in parts[4:10])
            shell = shell_number(n, l)
            a_params[Z, N, shell] = [E_th, E_0, sigma_0, y_a, P, y_w, l]

    b_params = np.zeros((31, 31, 9))
    with open(os.path.join(REF_DATA, "verner_B.dat")) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            Z, N = int(parts[0]), int(parts[1])
            b_params[Z, N] = [float(p) for p in parts[2:11]]

    c_params = np.zeros((31, 2), dtype=np.int64)
    with open(os.path.join(REF_DATA, "verner_C.dat")) as fh:
        for line in fh:
            if line.startswith("#") or not line.strip():
                continue
            parts = line.split()
            N, Ninn, Ntot = int(parts[0]), int(parts[1]), int(parts[2])
            c_params[N] = [Ninn, Ntot]

    np.savez_compressed(
        os.path.join(OUT_DIR, "verner_photo.npz"),
        a_params=a_params,
        b_params=b_params,
        c_params=c_params,
    )
    print("wrote verner_photo.npz")


def repackage_rec():
    with open(os.path.join(REF_DATA, "verner_rec_data.txt")) as fh:
        lines = [ln for ln in fh.read().splitlines()]
    # layout: header line, block marker, 2x30 rows (rrec), marker,
    # 4x30 rows (rnew), marker, 3 rows of 13 (fe)
    idx = 0

    def next_data_row():
        nonlocal idx
        while idx < len(lines):
            line = lines[idx]
            idx += 1
            vals = line.split()
            try:
                return [float(v) for v in vals]
            except ValueError:
                continue
        raise EOFError

    # skip the two header lines the reference skips
    idx = 2
    rrec = np.zeros((2, 31, 31))
    for i in range(2):
        for z in range(1, 31):
            row = next_data_row()
            rrec[i, z, 1:31] = row[:30]
    rnew = np.zeros((4, 31, 31))
    for i in range(4):
        for z in range(1, 31):
            row = next_data_row()
            rnew[i, z, 1:31] = row[:30]
    fe = np.zeros((3, 14))
    for i in range(3):
        row = next_data_row()
        fe[i, 1:14] = row[:13]

    np.savez_compressed(
        os.path.join(OUT_DIR, "verner_rec.npz"), rrec=rrec, rnew=rnew, fe=fe
    )
    print("wrote verner_rec.npz")


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    repackage_photo()
    repackage_rec()
