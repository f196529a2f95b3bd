"""Analyze a starbench numbered-snapshot series: ionization-front radius
vs time against the Spitzer and Hosokawa-Inutsuka expansion laws.

The reference's starbench analysis (benchmarks/starbench.py) reads its
numbered Gadget snapshots and plots R(t) between the two analytic laws
(Bisbas et al. 2015); this script applies the same acceptance to the
snapshot series our production RHD loop writes (snapshot cadence =
``snapshot time``).

Usage: python benchmarks/analyze_starbench_snapshots.py <dir> [prefix]
"""

import glob
import os
import sys

import h5py
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmacionize_tpu.models.rhd_simulation import (  # noqa: E402
    hosokawa_inutsuka_radius,
    spitzer_radius,
)

PC = 3.086e16
MYR = 3.15576e13


def front_radius_from_snapshot(path):
    with h5py.File(path, "r") as f:
        t = float(f["Header"].attrs["Time"])
        box = np.asarray(f["Header"].attrs["BoxSize"], dtype=np.float64)
        xh = np.asarray(f["PartType0"]["NeutralFractionH"], dtype=np.float64)
        coords = np.asarray(f["PartType0"]["Coordinates"], dtype=np.float64)
    n_cells = round(len(xh) ** (1.0 / 3.0))
    cell_volume = float(np.prod(box)) / len(xh)
    v_ion = float((xh < 0.5).sum()) * cell_volume
    # source at the box corner (reflective octant) → sphere = 8 octants
    rel = coords - 0.5 * box
    r = np.sqrt((rel**2).sum(1))
    corner = xh[np.argmin(r)] > 0.5  # center neutral → corner source
    if corner:
        v_ion *= 8.0
    del n_cells
    return t, (3.0 * v_ion / (4.0 * np.pi)) ** (1.0 / 3.0)


def main():
    folder = sys.argv[1] if len(sys.argv) > 1 else "."
    prefix = sys.argv[2] if len(sys.argv) > 2 else "starbench_"
    snaps = sorted(glob.glob(os.path.join(folder, prefix + "*.hdf5")))
    if not snaps:
        raise SystemExit(f"no {prefix}*.hdf5 under {folder}")

    q, n, alpha = 1e49, 3.113e9, 2.7e-19
    r_st = (3 * q / (4 * np.pi * n**2 * alpha)) ** (1.0 / 3.0)
    print(f"Stromgren radius: {r_st / PC:.3f} pc")
    print(f"{'t (Myr)':>9} {'R (pc)':>8} {'Spitzer':>8} {'Hos-In':>8} "
          f"{'R/Rsp':>6}")
    ok = True
    for path in snaps:
        t, r = front_radius_from_snapshot(path)
        r_sp = spitzer_radius(t, r_st)
        r_hi = hosokawa_inutsuka_radius(t, r_st)
        in_band = (0.85 * r_sp < r < 1.1 * r_hi) or t < 0.02 * MYR
        ok &= in_band
        print(f"{t / MYR:9.4f} {r / PC:8.3f} {r_sp / PC:8.3f} "
              f"{r_hi / PC:8.3f} {r / r_sp:6.3f}"
              + ("" if in_band else "  <-- outside band"))
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
