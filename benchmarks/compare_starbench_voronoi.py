"""Side-by-side: starbench_voronoi vs the C++ reference.

Runs our Voronoi RHD driver at the reference's exact configuration
(/root/reference/benchmarks/starbench_voronoi.param: 10000 UniformRandom
generators, 10 Lloyd iterations, 10 x 1e5 photons of radiation per fixed
0.000705 Myr step, gamma = 1.0001, to t = 0.141 Myr) and compares the
ionization-front trajectory R(t) and the final radial density profile
against the reference's snapshot series (run separately with the
AsciiFile writer; see benchmarks/RESULTS.md for the recipe).

Usage:
    python benchmarks/compare_starbench_voronoi.py <ref_snapshot_dir>

The reference snapshots are the patched ascii files
``starbench_voronoi_NNN.txt`` with columns x y z n volume frac [T ...];
both codes' front radii use the same estimator (radius of the sphere with
the ionized volume, cells with x_H < 0.5).
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmacionize_tpu.models import voronoi  # noqa: E402
from cmacionize_tpu.models.grid import GridGeometry  # noqa: E402
from cmacionize_tpu.models.rhd_simulation import (  # noqa: E402
    hosokawa_inutsuka_radius,
    spitzer_radius,
)
from cmacionize_tpu.models.voronoi_hydro import VoronoiRHDSimulation  # noqa: E402

PC = 3.086e16
MYR = 3.15576e13

N_GEN = 10000
N_LLOYD = 10
N_PHOTONS = 100000
NLOOP = 10
DT = 0.000705 * MYR
N_STEPS = 200  # 0.141 Myr / 0.000705 Myr
SNAP_EVERY = 20  # reference snapshot cadence: total time / 10
N_H = 3.113e9
R_ST = (3.0 * 1e49 / (4.0 * np.pi * N_H**2 * 2.7e-19)) ** (1.0 / 3.0)


def front_radius_from_ascii(path):
    """Same ionized-volume estimator as VoronoiRHDSimulation."""
    data = np.loadtxt(path)
    volume, frac = data[:, 4], data[:, 5]
    v_ion = float(volume[frac < 0.5].sum())
    return (3.0 * v_ion / (4.0 * np.pi)) ** (1.0 / 3.0)


def radial_density_profile(pos, n, volume, n_bins=16, r_max=1.256 * PC):
    r = np.sqrt((pos**2).sum(axis=1))
    edges = np.linspace(0.0, r_max, n_bins + 1)
    idx = np.clip(np.digitize(r, edges) - 1, 0, n_bins - 1)
    num = np.bincount(idx, weights=n * volume, minlength=n_bins)
    den = np.bincount(idx, weights=volume, minlength=n_bins)
    centers = 0.5 * (edges[1:] + edges[:-1])
    return centers, num / np.maximum(den, 1e-300)


def run_ours(seed=42):
    geometry = GridGeometry(
        anchor=(-1.256 * PC,) * 3, sides=(2.512 * PC,) * 3, shape=(32,) * 3)
    rng = np.random.default_rng(seed)
    grid = voronoi.build_voronoi_grid(
        geometry, rng.random((N_GEN, 3)), num_lloyd=N_LLOYD)
    sim = VoronoiRHDSimulation(
        grid, gamma=1.0001, timestep=DT, luminosity=1e49,
        source_position=(0.0, 0.0, 0.0), cross_section=6.3e-22,
        recombination_rate=2.7e-19, n_photons=N_PHOTONS, nloop=NLOOP,
        number_density=N_H, temperature=100.0, seed=seed)
    radii = [(0.0, sim.ionization_front_radius())]
    t0 = time.time()
    for chunk in range(N_STEPS // SNAP_EVERY):
        sim.run(SNAP_EVERY)
        radii.append((sim.time, sim.ionization_front_radius()))
        print(f"  ours t={sim.time / MYR:.4f} Myr "
              f"R={radii[-1][1] / PC:.3f} pc  [{time.time() - t0:.0f}s]",
              flush=True)
    return sim, radii


def main():
    ref_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sbv_ref"
    sim, ours = run_ours()

    ref_files = sorted(
        glob.glob(os.path.join(ref_dir, "starbench_voronoi_0*.txt")))
    print(f"\nreference snapshots found: {len(ref_files)} in {ref_dir}")

    print("\n  t (Myr)  R_ours  R_ref   ratio  Spitzer  Hos-In")
    worst = 0.0
    n_checked = 0
    for i, (t, r_ours) in enumerate(ours):
        if i == 0 or i >= len(ref_files):
            continue
        r_ref = front_radius_from_ascii(ref_files[i])
        r_sp = spitzer_radius(t, R_ST)
        r_hi = hosokawa_inutsuka_radius(t, R_ST)
        ratio = r_ours / r_ref
        worst = max(worst, abs(ratio - 1.0))
        n_checked += 1
        print(f"  {t / MYR:7.4f}  {r_ours / PC:6.3f}  {r_ref / PC:6.3f}"
              f"  {ratio:6.3f}  {r_sp / PC:7.3f}  {r_hi / PC:6.3f}")

    # final-time radial density profile comparison (shell volume-means)
    if n_checked:
        data = np.loadtxt(ref_files[min(len(ours) - 1, len(ref_files) - 1)])
        ref_pos = data[:, 0:3]  # reference writes absolute SI midpoints
        centers, prof_ref = radial_density_profile(
            ref_pos, data[:, 3], data[:, 4])
        gen_si = (sim.grid.generators * sim.grid.scale
                  + np.asarray(sim.grid.geometry.anchor))
        from cmacionize_tpu import constants

        n_ours = np.asarray(sim.state.rho) / constants.PROTON_MASS
        _, prof_ours = radial_density_profile(
            gen_si, n_ours, np.asarray(sim.grid.volumes))
        print("\n  r (pc)   n_ours (cm^-3)  n_ref (cm^-3)  ratio")
        good = 0
        for c, a, b in zip(centers, prof_ours, prof_ref):
            ratio = a / b if b > 0 else np.inf
            print(f"  {c / PC:6.3f}  {a / 1e6:13.1f}  {b / 1e6:13.1f}"
                  f"  {ratio:6.3f}")
            if 0.5 < ratio < 2.0:
                good += 1
        print(f"\nprofile bins within 2x: {good}/{len(centers)}")

    print(f"\nworst R(t) ratio deviation: {worst * 100:.1f}%")
    assert n_checked >= 5, "need at least 5 shared snapshot epochs"
    assert worst < 0.10, "front trajectories diverge by more than 10%"
    print("PASS")


if __name__ == "__main__":
    main()
