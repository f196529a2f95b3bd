"""Benchmark analysis plots.

The counterpart of the reference's per-benchmark analysis scripts
(benchmarks/stromgren.py etc.) for this framework's snapshots — though note
that because snapshots use the same Gadget layout, the reference's own
scripts also work unchanged.

Usage:
    python tools/plot_benchmarks.py stromgren snapshot.hdf5 [out.png]
    python tools/plot_benchmarks.py profile snapshot.hdf5 FieldName [out.png]
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

PC = 3.086e16


def radial_profile(filename, field):
    import h5py

    with h5py.File(filename, "r") as handle:
        box = np.asarray(handle["/Header"].attrs["BoxSize"])
        coords = np.asarray(handle["/PartType0/Coordinates"])
        values = np.asarray(handle[f"/PartType0/{field}"])
    radius = np.sqrt(((coords - 0.5 * box) ** 2).sum(1))
    return radius, values


def stromgren_plot(filename, out="stromgren_validation.png"):
    """Neutral-fraction profile vs the analytic Strömgren solution
    (reference analysis: /root/reference/benchmarks/stromgren.py:45-66)."""
    alpha, n_h, q, sigma = 4.0e-19, 1.0e8, 4.26e49, 6.3e-22
    r_st = (0.75 * q / (np.pi * n_h**2 * alpha)) ** (1.0 / 3.0)

    # analytic profile by integrating the on-the-spot equation outward
    rref = np.linspace(0.0, 1.2 * r_st, 1200)
    xref = np.zeros_like(rref)
    integral = 0.0
    factor = 0.125 * q * sigma / (np.pi * n_h * alpha)
    intfac = 0.0005 * r_st * n_h * sigma
    for i in range(1, len(rref)):
        a = factor * np.exp(-integral) / rref[i] ** 2
        xref[i] = 1.0 + a - np.sqrt(2.0 * a + a * a)
        integral += intfac * (xref[i - 1] + xref[i])

    radius, xh = radial_profile(filename, "NeutralFractionH")
    bins = np.linspace(0, radius.max(), 50)
    mids = 0.5 * (bins[1:] + bins[:-1])
    means = np.array([
        xh[(radius >= lo) & (radius < hi)].mean() if ((radius >= lo) & (radius < hi)).any() else np.nan
        for lo, hi in zip(bins[:-1], bins[1:])
    ])

    plt.figure(figsize=(7, 5))
    plt.semilogy(radius / PC, xh, ".", ms=0.5, alpha=0.3, color="grey")
    plt.semilogy(mids / PC, means, "o", color="C0", label="cmacionize-tpu")
    plt.semilogy(rref / PC, np.maximum(xref, 1e-8), "r-", label="analytic")
    plt.axvline(r_st / PC, color="r", ls="--", label="Strömgren radius")
    plt.xlabel("r (pc)")
    plt.ylabel(r"$x_{\rm H}$")
    plt.ylim(1e-7, 2)
    plt.legend()
    plt.tight_layout()
    plt.savefig(out, dpi=150)
    print(f"wrote {out}")


def generic_profile_plot(filename, field, out=None):
    radius, values = radial_profile(filename, field)
    out = out or f"{field}_profile.png"
    plt.figure(figsize=(7, 5))
    plt.plot(radius / PC, values, ".", ms=1, alpha=0.4)
    plt.xlabel("r (pc)")
    plt.ylabel(field)
    plt.tight_layout()
    plt.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "stromgren":
        stromgren_plot(*sys.argv[2:])
    elif mode == "profile":
        generic_profile_plot(*sys.argv[2:])
    else:
        raise SystemExit(f"unknown mode {mode}")
