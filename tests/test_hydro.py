"""Hydro tests: Riemann solvers on Toro problems, Sod tube integration.

Mirrors the reference's testRiemannSolver.cpp / testHydro.cpp /
testHydroIntegrator.cpp strategy: exact-solver spot values, HLLC
symmetry/consistency, and a 1D Sod shock tube run on the 3D grid compared
against the exact solution.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cmacionize_tpu.ops import hydro, riemann

GAMMA = 5.0 / 3.0


def test_exact_solver_sod_star_state():
    # Toro test 1 (gamma=1.4 classic values): p* ~ 0.30313, u* ~ 0.92745
    p_star, u_star = riemann.exact_star_pressure(
        jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0),
        jnp.asarray(0.125), jnp.asarray(0.0), jnp.asarray(0.1),
        gamma=1.4,
    )
    assert float(p_star) == pytest.approx(0.30313, rel=1e-3)
    assert float(u_star) == pytest.approx(0.92745, rel=1e-3)


def test_hllc_consistency_uniform_flow():
    # identical states: flux must equal the physical flux
    rho, u, p = 1.3, 0.7, 2.1
    f = riemann.hllc_flux(
        *(jnp.asarray(v) for v in (rho, u, 0.2, -0.1, p)),
        *(jnp.asarray(v) for v in (rho, u, 0.2, -0.1, p)),
        gamma=GAMMA,
    )
    e = p / (GAMMA - 1) + 0.5 * rho * (u**2 + 0.2**2 + 0.1**2)
    assert float(f.mass) == pytest.approx(rho * u, rel=1e-6)
    assert float(f.mom_n) == pytest.approx(rho * u * u + p, rel=1e-6)
    assert float(f.energy) == pytest.approx((e + p) * u, rel=1e-6)


def test_hllc_symmetry():
    # mirrored states -> mirrored flux (mass flux flips sign)
    args_l = (1.0, 0.5, 0.0, 0.0, 1.0)
    args_r = (0.5, -0.2, 0.0, 0.0, 0.3)
    f1 = riemann.hllc_flux(
        *(jnp.asarray(v) for v in args_l), *(jnp.asarray(v) for v in args_r),
        gamma=GAMMA,
    )
    mirrored_l = (args_r[0], -args_r[1], 0.0, 0.0, args_r[4])
    mirrored_r = (args_l[0], -args_l[1], 0.0, 0.0, args_l[4])
    f2 = riemann.hllc_flux(
        *(jnp.asarray(v) for v in mirrored_l),
        *(jnp.asarray(v) for v in mirrored_r),
        gamma=GAMMA,
    )
    assert float(f1.mass) == pytest.approx(-float(f2.mass), rel=1e-5, abs=1e-8)
    assert float(f1.mom_n) == pytest.approx(float(f2.mom_n), rel=1e-5)
    assert float(f1.energy) == pytest.approx(-float(f2.energy), rel=1e-5, abs=1e-8)


def _run_sod(n=128, t_end=0.2, riemann_solver="HLLC"):
    shape = (n, 4, 4)
    dx = 1.0 / n
    x = (np.arange(n) + 0.5) * dx
    rho = np.where(x < 0.5, 1.0, 0.125)
    p = np.where(x < 0.5, 1.0, 0.1)
    w = hydro.Primitives(
        rho=jnp.asarray(np.broadcast_to(rho[:, None, None], shape), jnp.float32),
        vx=jnp.zeros(shape, jnp.float32),
        vy=jnp.zeros(shape, jnp.float32),
        vz=jnp.zeros(shape, jnp.float32),
        p=jnp.asarray(np.broadcast_to(p[:, None, None], shape), jnp.float32),
    )
    u = hydro.conserved_from_primitives(w, GAMMA)
    boundaries = (
        (hydro.BC_OUTFLOW, hydro.BC_OUTFLOW),
        (hydro.BC_PERIODIC, hydro.BC_PERIODIC),
        (hydro.BC_PERIODIC, hydro.BC_PERIODIC),
    )
    cell_size = (dx, dx, dx)
    t = 0.0
    while t < t_end:
        dt = min(float(hydro.cfl_timestep(u, cell_size, cfl=0.4, gamma=GAMMA)),
                 t_end - t)
        u = hydro.hydro_step(
            u, dt, boundaries=boundaries, cell_size=cell_size, gamma=GAMMA,
            riemann_solver=riemann_solver,
        )
        t += dt
    return x, u


def test_sod_tube_vs_exact():
    x, u = _run_sod()
    w = hydro.primitives_from_conserved(u, GAMMA)
    rho_num = np.asarray(w.rho[:, 2, 2])
    # exact solution sampled at s = (x - 0.5)/t
    s = jnp.asarray((x - 0.5) / 0.2, jnp.float32)
    rho_ex, u_ex, p_ex = riemann.exact_sample(
        jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0),
        jnp.asarray(0.125), jnp.asarray(0.0), jnp.asarray(0.1),
        s, gamma=GAMMA,
    )
    rho_ex = np.asarray(rho_ex)
    l1 = np.abs(rho_num - rho_ex).mean()
    assert l1 < 0.012, f"Sod L1 density error too large: {l1}"
    # conservation of mass (16 y-z columns of 128 cells, dx = 1/128)
    assert float(jnp.sum(u.rho)) * (1.0 / 128) / 16 == pytest.approx(
        (1.0 + 0.125) / 2, rel=1e-4
    )


def test_uniform_state_is_steady():
    shape = (8, 8, 8)
    w = hydro.Primitives(
        rho=jnp.full(shape, 1.0, jnp.float32),
        vx=jnp.full(shape, 0.3, jnp.float32),
        vy=jnp.full(shape, -0.1, jnp.float32),
        vz=jnp.full(shape, 0.2, jnp.float32),
        p=jnp.full(shape, 2.0, jnp.float32),
    )
    u = hydro.conserved_from_primitives(w, GAMMA)
    boundaries = ((hydro.BC_PERIODIC,) * 2,) * 3
    u2 = hydro.hydro_step(
        u, 0.01, boundaries=boundaries, cell_size=(0.1, 0.1, 0.1), gamma=GAMMA
    )
    for a, b in zip(u, u2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_bondi_profile_held():
    """Isothermal Bondi accretion: point-mass gravity + analytic inflow BCs
    + central mask must HOLD the analytic profile (reduced resolution).

    Mirrors the bondi benchmark acceptance test
    (/root/reference/benchmarks/bondi.py)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
    from run_bondi import build_simulation, AU, YR
    from cmacionize_tpu.models.bondi import BondiProfile

    import dataclasses

    sim = build_simulation(small=True, log=lambda *a: None)
    sim.config = dataclasses.replace(sim.config, total_time=4 * YR)
    u, _ = sim.run(log_every=1000)
    profile = BondiProfile(
        central_mass=18.0 * 1.98855e30, bondi_density=1e-16,
        sound_speed=2031.0)
    centers = sim.geometry.cell_centers()
    rho0, _, _, _ = profile.evaluate(centers)
    r = np.sqrt((centers**2).sum(-1))
    w = hydro.primitives_from_conserved(u, sim.config.gamma)
    rho = np.asarray(w.rho)
    sel = (r > 15 * AU) & (r < 45 * AU)
    rel = np.abs(rho[sel] / rho0[sel] - 1)
    assert np.median(rel) < 0.08, np.median(rel)


def test_sod_tube_exact_solver_production():
    """The exact solver is a selectable production flux
    (RiemannSolverFactory.hpp:54-57), not just a validation oracle."""
    x, u = _run_sod(riemann_solver="Exact")
    w = hydro.primitives_from_conserved(u, GAMMA)
    rho_num = np.asarray(w.rho[:, 2, 2])
    s = jnp.asarray((x - 0.5) / 0.2, jnp.float32)
    rho_ex, _, _ = riemann.exact_sample(
        jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0),
        jnp.asarray(0.125), jnp.asarray(0.0), jnp.asarray(0.1),
        s, gamma=GAMMA,
    )
    l1 = np.abs(rho_num - np.asarray(rho_ex)).mean()
    assert l1 < 0.012, f"Sod(Exact) L1 density error too large: {l1}"


def test_exact_flux_matches_hllc_on_smooth_states():
    rng = np.random.default_rng(0)
    n = 256
    rho = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    u = jnp.asarray(rng.uniform(-0.1, 0.1, n), jnp.float32)
    v = jnp.asarray(rng.uniform(-0.1, 0.1, n), jnp.float32)
    w_ = jnp.asarray(rng.uniform(-0.1, 0.1, n), jnp.float32)
    p = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    fe = riemann.exact_flux(rho, u, v, w_, p, rho, u, v, w_, p, gamma=GAMMA)
    fh = riemann.hllc_flux(rho, u, v, w_, p, rho, u, v, w_, p, gamma=GAMMA)
    # identical left/right states: both must return the physical flux
    np.testing.assert_allclose(np.asarray(fe.mass), np.asarray(fh.mass),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fe.energy), np.asarray(fh.energy),
                               rtol=1e-4, atol=1e-5)


def test_exact_flux_vacuum_branches_finite():
    """Vacuum left/right/generation cases produce finite fluxes
    (ExactRiemannSolver.hpp:866 vacuum handling)."""
    z = jnp.zeros(1)
    one = jnp.ones(1)
    # right vacuum
    f = riemann.exact_flux(one, z, z, z, one, z * 0.0, z, z, z, z)
    assert np.isfinite(np.asarray(f)).all()
    assert float(f.mass[0]) > 0.0  # gas expands into the vacuum
    # left vacuum
    f = riemann.exact_flux(z * 0.0, z, z, z, z, one, z, z, z, one)
    assert np.isfinite(np.asarray(f)).all()
    assert float(f.mass[0]) < 0.0
    # both vacuum
    f = riemann.exact_flux(z, z, z, z, z, z, z, z, z, z)
    np.testing.assert_array_equal(np.asarray(f), 0.0)
    # vacuum generation: strongly receding flows
    f = riemann.exact_flux(
        one, -10.0 * one, z, z, 0.01 * one,
        one, 10.0 * one, z, z, 0.01 * one)
    assert np.isfinite(np.asarray(f)).all()
    np.testing.assert_allclose(np.asarray(f.mass), 0.0, atol=1e-6)


def test_internal_units_roundtrip_exact():
    from cmacionize_tpu.ops.hydro import InternalHydroUnits

    rng = np.random.default_rng(1)
    shape = (8, 8, 8)
    u = hydro.HydroState(
        rho=jnp.asarray(rng.uniform(1e-21, 1e-19, shape), jnp.float32),
        mom_x=jnp.asarray(rng.uniform(-1e-17, 1e-17, shape), jnp.float32),
        mom_y=jnp.asarray(rng.uniform(-1e-17, 1e-17, shape), jnp.float32),
        mom_z=jnp.asarray(rng.uniform(-1e-17, 1e-17, shape), jnp.float32),
        energy=jnp.asarray(rng.uniform(1e-14, 1e-12, shape), jnp.float32),
    )
    units = InternalHydroUnits.from_state(u, box_size=3.086e16)
    back = units.to_si(units.to_internal(u))
    for a, b in zip(u, back):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-7)


def test_internal_units_sod_astrophysical_scale():
    """Deep-contrast Sod at ISM scales: the internal-unit path reproduces
    the O(1) solution shape (InternalHydroUnits.hpp round-off rescaling)."""
    from cmacionize_tpu.ops.hydro import (
        InternalHydroUnits,
        hydro_step_internal,
    )

    n = 64
    pc = 3.086e16
    rho_u, p_u, L = 1.0e-20, 1.0e-12, pc  # ISM-ish scales
    shape = (n, 4, 4)
    dx = L / n
    x = (np.arange(n) + 0.5) / n
    rho = np.where(x < 0.5, 1.0, 0.125) * rho_u
    p = np.where(x < 0.5, 1.0, 0.1) * p_u
    w = hydro.Primitives(
        rho=jnp.asarray(np.broadcast_to(rho[:, None, None], shape), jnp.float32),
        vx=jnp.zeros(shape, jnp.float32),
        vy=jnp.zeros(shape, jnp.float32),
        vz=jnp.zeros(shape, jnp.float32),
        p=jnp.asarray(np.broadcast_to(p[:, None, None], shape), jnp.float32),
    )
    u = hydro.conserved_from_primitives(w, GAMMA)
    units = InternalHydroUnits.from_averages(L, rho.mean(), p.mean())
    boundaries = (
        (hydro.BC_OUTFLOW, hydro.BC_OUTFLOW),
        (hydro.BC_PERIODIC, hydro.BC_PERIODIC),
        (hydro.BC_PERIODIC, hydro.BC_PERIODIC),
    )
    # t_end chosen as the scaled equivalent of t=0.2 on the unit problem
    t_scale = np.sqrt(rho_u / p_u) * L
    t_end = 0.2 * t_scale
    t = 0.0
    while t < t_end:
        dt = min(float(hydro.cfl_timestep(u, (dx,) * 3, cfl=0.4, gamma=GAMMA)),
                 t_end - t)
        u = hydro_step_internal(
            u, dt, units, boundaries=boundaries, cell_size=(dx,) * 3,
            gamma=GAMMA)
        t += dt
    w_out = hydro.primitives_from_conserved(u, GAMMA)
    rho_num = np.asarray(w_out.rho[:, 2, 2]) / rho_u
    s = jnp.asarray((x - 0.5) / 0.2, jnp.float32)
    rho_ex, _, _ = riemann.exact_sample(
        jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(1.0),
        jnp.asarray(0.125), jnp.asarray(0.0), jnp.asarray(0.1),
        s, gamma=GAMMA)
    l1 = np.abs(rho_num - np.asarray(rho_ex)).mean()
    assert l1 < 0.025, f"astrophysical-scale Sod L1 error: {l1}"
