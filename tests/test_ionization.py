"""Ionization balance + end-to-end mini-stromgren integration test.

The integration test mirrors the reference's testIonizationSimulation.cpp
(full driver from a parameter dict, smoke + physics check) at reduced size.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cmacionize_tpu.models.grid import GridGeometry
from cmacionize_tpu.models.ionization_simulation import (
    HOnlyConfig,
    HOnlyIonizationSimulation,
)
from cmacionize_tpu.ops import ionization


def test_hydrogen_balance_limits():
    nH = 1e8
    alpha = 4e-19
    # no radiation -> fully neutral
    assert float(ionization.hydrogen_neutral_fraction(0.0, nH, alpha)) == 1.0
    # enormous radiation -> floor
    x = float(ionization.hydrogen_neutral_fraction(1e10, nH, alpha))
    # the 1e-14 floor rounds to 9.9999998e-15 in f32
    assert x >= 0.99 * ionization.NEUTRAL_FRACTION_FLOOR
    assert x < 1e-10


def test_hydrogen_balance_solves_quadratic():
    # check the root actually satisfies jH x = alpha nH (1-x)^2 over a wide
    # dynamic range (f32)
    nH = 1e8
    alpha = 4e-19
    for jH in [1e-12, 1e-9, 1e-6, 1e-3, 1.0]:
        x = float(ionization.hydrogen_neutral_fraction(jH, nH, alpha))
        lhs = jH * x
        rhs = alpha * nH * (1 - x) ** 2
        assert lhs == pytest.approx(rhs, rel=2e-3), (jH, x)


def test_mini_stromgren_radius():
    # 24^3 grid, 2e4 photons, 8 iterations: the ionized sphere radius must
    # land within ~10% of the analytic Stromgren radius
    geometry = GridGeometry(
        anchor=(-5 * 3.086e16,) * 3,
        sides=(10 * 3.086e16,) * 3,
        shape=(24, 24, 24),
    )
    config = HOnlyConfig(
        geometry=geometry,
        number_density=1e8,
        temperature=8000.0,
        source_position=(0.0, 0.0, 0.0),
        luminosity=4.26e49,
        cross_section=6.3e-22,
        recombination_rate=4e-19,
        n_photons=20000,
        n_iterations=8,
    )
    sim = HOnlyIonizationSimulation(config, seed=7)
    xH = np.asarray(sim.run())
    Rs = sim.stromgren_radius_analytic()
    centers = geometry.cell_centers()
    r = np.sqrt((centers**2).sum(-1))
    # ionized volume estimate: cells with xH < 0.5
    v_ion = (xH < 0.5).sum() * geometry.cell_volume
    r_measured = (3 * v_ion / (4 * np.pi)) ** (1 / 3)
    assert r_measured == pytest.approx(Rs, rel=0.1)
    # center is highly ionized, corners neutral
    assert xH[12, 12, 12] < 1e-4
    assert xH[0, 0, 0] > 0.99


def test_photon_dp_matches_physics():
    # the sharded photon-DP iteration must produce the same converged state
    import jax

    from cmacionize_tpu.parallel.mesh import make_mesh
    from cmacionize_tpu.parallel.photon_dp import make_dp_iteration

    n_devices = len(jax.devices())
    assert n_devices == 8, "conftest should force 8 virtual CPU devices"
    shape = (16, 16, 16)
    dx = 10 * 3.086e16 / shape[0]
    sigma = 6.3e-22
    n_per_device = 2048
    mesh = make_mesh(n_devices)
    step = make_dp_iteration(
        mesh,
        shape=shape,
        periodic=(False, False, False),
        n_photons_per_device=n_per_device,
        sigma_dx=sigma * dx,
        source_gpos=(8.0, 8.0, 8.0),
        jfac_scale=4.26e49 * sigma * dx / (n_per_device * n_devices * dx**3),
        alpha=4e-19,
    )
    nd = jnp.full(shape, 1e8, jnp.float32)
    xh = jnp.full(shape, 1e-6, jnp.float32)
    for _ in range(6):
        keys = jax.random.split(jax.random.PRNGKey(_), n_devices)
        xh, jH, n_esc = step(keys, xh, nd)
    xh = np.asarray(xh)
    # center ionized, corner neutral (same physics as single-device)
    assert xh[8, 8, 8] < 1e-3
    assert xh[0, 0, 0] > 0.9
