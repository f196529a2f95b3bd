"""Drive: Bondi accretion benchmark (isothermal hydro + point-mass gravity).

Workload follows /root/reference/benchmarks/bondi.param: 64^3 cells over a
100 au box, 18 Msol point mass, isothermal gas (c_s = 2.031 km/s), Bondi
inflow ghost cells on all faces, central 20 au sphere masked to the analytic
profile, evolved for 20 yr (~1 flow crossing time).  Validation compares the
spherically-averaged density profile to the analytic Bondi solution
(cf. /root/reference/benchmarks/bondi.py).

Usage: PYTHONPATH=/root/repo python benchmarks/run_bondi.py [small]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cmacionize_tpu import constants  # noqa: E402
from cmacionize_tpu.models.bondi import BondiProfile  # noqa: E402
from cmacionize_tpu.models.grid import GridGeometry  # noqa: E402
from cmacionize_tpu.ops import hydro  # noqa: E402

AU = 1.496e11
YR = 365.25 * 24 * 3600.0


def run_bondi(n_cells=64, t_end=20 * YR, cfl=0.2, log=print):
    geometry = GridGeometry(
        anchor=(-50 * AU,) * 3, sides=(100 * AU,) * 3, shape=(n_cells,) * 3
    )
    profile = BondiProfile(
        central_mass=18.0 * constants.SOLAR_MASS,
        bondi_density=1e-16,  # 1e-19 g/cm^3
        sound_speed=2031.0,
    )
    centers = geometry.cell_centers()
    rho0, v0, p0, _ = profile.evaluate(centers)

    # initial condition: the analytic profile itself (the reference starts
    # from the equivalent homogeneous state and relaxes; starting on the
    # profile tests that the scheme HOLDS the analytic solution)
    w = hydro.Primitives(
        rho=jnp.asarray(rho0, jnp.float32),
        vx=jnp.asarray(v0[..., 0], jnp.float32),
        vy=jnp.asarray(v0[..., 1], jnp.float32),
        vz=jnp.asarray(v0[..., 2], jnp.float32),
        p=jnp.asarray(p0, jnp.float32),
    )
    gamma_eff = 1.0 + 1e-6
    u = hydro.conserved_from_primitives(w, gamma_eff)

    # masked center: reset to the analytic profile each step (r < 10 au)
    r = np.sqrt((centers**2).sum(-1))
    mask = jnp.asarray(r < 10 * AU)
    u_masked = u

    # point-mass gravity (masked region is overwritten anyway)
    g_mag = -constants.NEWTON_CONSTANT * 18.0 * constants.SOLAR_MASS / np.maximum(r, AU) ** 2
    gravity = tuple(
        jnp.asarray(g_mag * centers[..., a] / np.maximum(r, 1e-3 * AU), jnp.float32)
        for a in range(3)
    )

    # Bondi inflow ghost cells on all 6 faces (2 layers).  Padding proceeds
    # axis by axis, so the ghost slabs of later axes must cover the
    # already-padded earlier axes: evaluate the profile once on the fully
    # padded grid and slice.
    dx = float(geometry.cell_size[0])
    n = n_cells
    axes_1d = [
        geometry.anchor[a] + (np.arange(-2, n + 2) + 0.5) * dx for a in range(3)
    ]
    padded_centers = np.stack(np.meshgrid(*axes_1d, indexing="ij"), axis=-1)
    p_rho, p_v, p_p, _ = profile.evaluate(padded_centers)
    padded_fields = (p_rho, p_v[..., 0], p_v[..., 1], p_v[..., 2], p_p)

    def ghost_slab(axis, side):
        sl = [slice(None)] * 3
        # earlier axes: fully padded; later axes: interior only
        for a in range(axis + 1, 3):
            sl[a] = slice(2, -2)
        sl[axis] = slice(0, 2) if side == "lo" else slice(n + 2, n + 4)
        return tuple(
            jnp.asarray(f[tuple(sl)], jnp.float32) for f in padded_fields
        )

    inflow_states = {
        (axis, side): ghost_slab(axis, side)
        for axis in range(3)
        for side in ("lo", "hi")
    }

    boundaries = ((hydro.BC_INFLOW, hydro.BC_INFLOW),) * 3
    cell_size = (dx,) * 3
    vmax = float(np.abs(v0).max()) + profile.sound_speed
    dt = cfl * dx / vmax
    n_steps = int(np.ceil(t_end / dt))
    log(f"dt = {dt / YR:.4f} yr, {n_steps} steps")

    @jax.jit
    def step(u):
        u = hydro.isothermal_hydro_step(
            u, dt,
            sound_speed=profile.sound_speed,
            boundaries=boundaries, cell_size=cell_size,
            gravity=gravity, inflow_states=inflow_states,
        )
        return hydro.apply_hydro_mask(u, mask, u_masked)

    t0 = time.time()
    for i in range(n_steps):
        u = step(u)
    jax.block_until_ready(u)
    float(u.rho.sum())
    elapsed = time.time() - t0
    log(f"{n_steps} steps in {elapsed:.1f}s "
        f"({n_steps * geometry.n_cells / elapsed:.3g} cell-updates/s)")
    return geometry, profile, u, rho0, r


def main():
    small = "small" in sys.argv[1:]
    geometry, profile, u, rho0, r = run_bondi(n_cells=32 if small else 64)
    w = hydro.primitives_from_conserved(u, 1.0 + 1e-6)
    rho = np.asarray(w.rho)

    # compare the evolved profile to the analytic solution outside the mask
    sel = (r > 15 * AU) & (r < 45 * AU)
    rel = np.abs(rho[sel] / rho0[sel] - 1)
    print(f"density deviation from analytic Bondi profile after 20 yr:")
    print(f"  median {np.median(rel) * 100:.2f}%  p95 {np.percentile(rel, 95) * 100:.2f}%")
    assert np.median(rel) < 0.05, "Bondi profile not held"
    # inflow check: the radial velocity stays negative (accreting) outside
    # the mask
    centers = geometry.cell_centers()
    rr = np.maximum(np.sqrt((centers**2).sum(-1)), 1.0)
    vr = (
        np.asarray(w.vx) * centers[..., 0]
        + np.asarray(w.vy) * centers[..., 1]
        + np.asarray(w.vz) * centers[..., 2]
    ) / rr
    assert np.median(vr[sel]) < 0.0
    print("PASS")


if __name__ == "__main__":
    main()
