"""Polarized dust scattering: matrix invariants + pattern physics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmacionize_tpu.ops import polarization as pol


def _band(**kw):
    base = dict(hgg=0.44, pl=0.43, albedo=0.54, kappa=21.9, sc=0.0, pc=0.0)
    base.update(kw)
    return pol.ScatteringBand(**base)


def test_scattering_matrix_limits():
    band = _band()
    # forward scattering: no polarization, peak phase
    P1, P2, P3, P4 = pol.scattering_matrix(jnp.asarray(1.0), band)
    g = band.hgg
    assert float(P1) == pytest.approx((1 - g * g) / (1 - g) ** 3, rel=1e-6)
    assert float(P2) == 0.0
    assert float(P3) == pytest.approx(float(P1), rel=1e-6)
    # 90°: linear polarization peaks at pl
    P1, P2, P3, P4 = pol.scattering_matrix(jnp.asarray(0.0), band)
    assert float(-P2 / P1) == pytest.approx(band.pl, rel=1e-6)
    assert float(P3) == 0.0
    assert float(P4) == 0.0  # pc = 0


def test_unpolarized_90deg_single_scatter_degree():
    """Unpolarized light scattered by 90° acquires degree = pl."""
    band = _band()
    n = 512
    key = jax.random.PRNGKey(0)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    nx, ny, nz = pol.initial_reference_normal(d[:, 0], d[:, 1], d[:, 2])
    nref = jnp.stack([nx, ny, nz], 1)
    I = jnp.ones(n)
    Z = jnp.zeros(n)
    cos_scat = jnp.zeros(n)  # 90 degrees
    d2, n2, I2, Q2, U2, V2 = pol.scatter_polarized(
        key, d, nref, I, Z, Z, Z, cos_scat, band)
    # direction: still unit, perpendicular to old direction
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d2), axis=1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2[:, 2]), 0.0, atol=1e-5)
    # weight preserved, degree of polarization = pl in the scattering frame
    np.testing.assert_allclose(np.asarray(I2), 1.0, atol=1e-6)
    degree = np.sqrt(np.asarray(Q2) ** 2 + np.asarray(U2) ** 2)
    np.testing.assert_allclose(degree, band.pl, rtol=1e-5)
    # reference normal stays perpendicular to the new direction
    dots = np.sum(np.asarray(d2) * np.asarray(n2), axis=1)
    np.testing.assert_allclose(dots, 0.0, atol=1e-5)


def test_forward_scatter_preserves_stokes():
    band = _band()
    n = 64
    key = jax.random.PRNGKey(1)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    nref = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    I = jnp.ones(n)
    Q = jnp.full(n, 0.3)
    Z = jnp.zeros(n)
    d2, n2, I2, Q2, U2, V2 = pol.scatter_polarized(
        key, d, nref, I, Q, Z, Z, jnp.ones(n), band)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-6)
    # degree of polarization is conserved under forward scattering
    deg = np.sqrt(np.asarray(Q2) ** 2 + np.asarray(U2) ** 2)
    np.testing.assert_allclose(deg, 0.3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(I2), 1.0, atol=1e-6)


def test_peel_off_degenerate_direction():
    """Packets already flying toward the observer peel off with the
    forward-scattering matrix (no polarization change)."""
    band = _band()
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    nref = jnp.asarray([[1.0, 0.0, 0.0]])
    one = jnp.ones(1)
    I_o, Q_o, U_o, V_o = pol.peel_off_polarized(
        d, nref, one, 0.2 * one, jnp.zeros(1), jnp.zeros(1),
        np.array([0.0, 0.0, 1.0]), np.array([1.0, 0.0, 0.0]), band)
    g = band.hgg
    expected_I = (1 - g * g) / (1 - g) ** 3 / (4 * np.pi)
    assert float(I_o[0]) == pytest.approx(expected_I, rel=1e-5)
    # Q preserved up to the same phase factor
    assert float(Q_o[0] / I_o[0]) == pytest.approx(0.2, rel=1e-4)


def test_polarized_dust_image_centrosymmetric():
    """Face-on image of a compact source in a dust slab: single-scattered
    light is tangentially polarized — the radial Stokes parameter Q_r is
    negative (for pl > 0 the E-vector is ⊥ to the scattering plane) and
    |V| ≈ 0 with pc = 0."""
    from cmacionize_tpu.models.dust_simulation import (
        DustConfig,
        DustSimulation,
    )
    from cmacionize_tpu.models.grid import GridGeometry

    pc_m = 3.086e16
    geom = GridGeometry(anchor=(-5 * pc_m,) * 3, sides=(10 * pc_m,) * 3,
                        shape=(16, 16, 16), periodic=(False,) * 3)
    config = DustConfig(
        geometry=geom,
        dust_central_density=2.0 / (10 * pc_m),  # τ ~ 2 across the box
        dust_scale_radius=100 * pc_m,  # ~uniform slab
        dust_scale_height=100 * pc_m,
        stellar_scale_radius=0.1 * pc_m,  # compact central source
        stellar_scale_height=0.1 * pc_m,
        n_photons=40000,
        n_scatterings=1,
        ccd_pixels=(32, 32),
        polarization=True,
    )
    sim = DustSimulation(config, seed=7)
    images = sim.run_polarized()
    assert set(images) == {"I", "Q", "U", "V"}
    assert images["I"].sum() > 0
    # V stays zero without linear→circular conversion
    assert np.abs(images["V"]).max() <= 1e-8 * images["I"].max()

    # radial Stokes parameter: Q_r = Q cos2φ + U sin2φ around the center
    npx = 32
    # CCD axis 0 is x (dust_simulation._ccd_pixel: pix = px * npy + py)
    xx, yy = np.meshgrid(np.arange(npx) + 0.5 - npx / 2,
                         np.arange(npx) + 0.5 - npx / 2, indexing="ij")
    phi = np.arctan2(yy, xx)
    Qr = images["Q"] * np.cos(2 * phi) + images["U"] * np.sin(2 * phi)
    # annulus away from the center: scattered halo dominated
    r = np.sqrt(xx**2 + yy**2)
    ring = (r > 6) & (r < 14)
    # tangential pattern: net Q_r strictly negative and significant
    q_r_sum = Qr[ring].sum()
    assert q_r_sum < 0
    # polarized flux is a noticeable fraction of scattered flux in the ring
    p_frac = np.abs(q_r_sum) / images["I"][ring].sum()
    assert p_frac > 0.02
