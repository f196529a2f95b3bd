"""Dust-scattering RT tests (the DustSimulation mode)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cmacionize_tpu.models.dust_simulation import (
    DustConfig,
    DustSimulation,
    henyey_greenstein_cos,
    henyey_greenstein_phase,
    _rotate_to_new_direction,
)
from cmacionize_tpu.models.grid import GridGeometry

KPC = 3.086e19


def test_hg_sampling_statistics():
    # mean cosine of the HG phase function equals g
    g = 0.44
    cos = np.asarray(henyey_greenstein_cos(jax.random.PRNGKey(0), g, 200000))
    assert cos.mean() == pytest.approx(g, abs=0.01)
    assert cos.min() >= -1 and cos.max() <= 1
    # phase function normalizes over the sphere
    mu = np.linspace(-1, 1, 20001)
    phase = np.asarray(henyey_greenstein_phase(jnp.asarray(mu), g))
    integral = 2 * np.pi * np.trapezoid(phase, mu)
    assert integral == pytest.approx(1.0, rel=1e-4)


def test_rotation_preserves_angle():
    key = jax.random.PRNGKey(1)
    n = 1000
    from cmacionize_tpu.models import sources

    dx, dy, dz = sources.isotropic_directions(key, n)
    cos_scat = jnp.full((n,), 0.3, jnp.float32)
    ndx, ndy, ndz = _rotate_to_new_direction(
        jax.random.PRNGKey(2), dx, dy, dz, cos_scat
    )
    dot = np.asarray(dx * ndx + dy * ndy + dz * ndz)
    np.testing.assert_allclose(dot, 0.3, atol=1e-4)
    norm = np.asarray(ndx**2 + ndy**2 + ndz**2)
    np.testing.assert_allclose(norm, 1.0, atol=1e-5)


def test_dust_image_centrally_concentrated():
    geometry = GridGeometry(
        anchor=(-10 * KPC, -10 * KPC, -5 * KPC),
        sides=(20 * KPC, 20 * KPC, 10 * KPC),
        shape=(32, 32, 16),
    )
    config = DustConfig(
        geometry=geometry,
        dust_central_density=2e-21,  # optical depth ~ few through center
        dust_scale_radius=5 * KPC,
        dust_scale_height=0.3 * KPC,
        stellar_scale_radius=4 * KPC,
        stellar_scale_height=0.25 * KPC,
        n_photons=20000,
        n_scatterings=2,
        ccd_pixels=(32, 32),
    )
    sim = DustSimulation(config, seed=3)
    image = sim.run()
    assert image.shape == (32, 32)
    assert np.all(np.isfinite(image)) and image.sum() > 0
    # face-on exponential disc: central surface brightness dominates
    center = image[12:20, 12:20].mean()
    edge = np.concatenate([image[:4].ravel(), image[-4:].ravel()]).mean()
    assert center > 5 * edge


def test_peel_off_tau_nonzero_through_opaque_disc():
    """Regression (round 4): the peel-off optical depth was silently ZERO
    for every event — the 1e30 'never absorb' tau target cancelled the
    accumulated tau in f32 (1e30 - tau == 1e30), wiping all extinction
    from the CCD images (caught by the dusty_galaxy image comparison:
    inverted dust lane, correlation 0.73)."""
    import jax.numpy as jnp

    from cmacionize_tpu.models.dust_simulation import DustConfig, DustSimulation
    from cmacionize_tpu.models.grid import GridGeometry

    KPC = 3.086e19
    geometry = GridGeometry((-12 * KPC,) * 3, (24 * KPC,) * 3, (64, 64, 64))
    config = DustConfig(
        geometry=geometry,
        dust_central_density=21.9 * 1.674e-27 * 1e6,
        dust_scale_radius=6 * KPC,
        dust_scale_height=0.22 * KPC,
        stellar_scale_radius=5 * KPC,
        stellar_scale_height=0.6 * KPC,
        n_photons=64,
        view_theta=np.deg2rad(89.7),
        view_phi=0.0,
    )
    sim = DustSimulation(config)
    center = jnp.asarray([[32.2, 32.2, 32.2]], jnp.float32)
    tau = float(sim._peel_off_tau(center)[0])
    # numeric integral along the observer direction gives ~5.3 at 201^3
    # resolution; the coarse 64^3 grid resolves it to tens of percent
    assert 2.0 < tau < 10.0, tau


def test_dust_dp_matches_single_device():
    """Photon-DP dust RT (CCD images psum'd over the mesh) agrees with the
    single-device run to MC noise on total flux and image structure."""
    from cmacionize_tpu.parallel.mesh import make_mesh

    geometry = GridGeometry(
        anchor=(-10 * KPC, -10 * KPC, -5 * KPC),
        sides=(20 * KPC, 20 * KPC, 10 * KPC),
        shape=(32, 32, 16),
    )
    config = DustConfig(
        geometry=geometry,
        dust_central_density=2e-21,
        dust_scale_radius=5 * KPC,
        dust_scale_height=0.3 * KPC,
        stellar_scale_radius=4 * KPC,
        stellar_scale_height=0.25 * KPC,
        n_photons=40000,
        n_scatterings=2,
        ccd_pixels=(32, 32),
    )
    img1 = DustSimulation(config, seed=3).run()
    img8 = DustSimulation(config, seed=3).run(mesh=make_mesh(8))
    assert img8.shape == img1.shape
    assert np.all(np.isfinite(img8))
    assert img8.sum() == pytest.approx(img1.sum(), rel=0.05)
    # same structure (smoothed correlation over the bright region)
    a, b = img1.ravel(), img8.ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95
