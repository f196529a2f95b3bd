"""Continuous sources (Planar/ExtendedDisc/DistantStar) + fractal mask."""

import jax
import numpy as np
import pytest

from cmacionize_tpu.models.density_functions import (
    apply_fractal_mask,
    fractal_distribution,
)
from cmacionize_tpu.models.grid import GridGeometry
from cmacionize_tpu.models.sources import (
    emit_distant_star,
    emit_extended_disc,
    emit_planar,
)


def _unit(dx, dy, dz):
    n = np.sqrt(np.asarray(dx) ** 2 + np.asarray(dy) ** 2
                + np.asarray(dz) ** 2)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_emit_planar():
    key = jax.random.PRNGKey(0)
    px, py, pz, dx, dy, dz, tau, freq, w = emit_planar(
        key, 4096, (16, 16, 16), axis=2, plane_coord=8.0,
        anchors=(2.0, 4.0), sides=(8.0, 8.0))
    px, py, pz = np.asarray(px), np.asarray(py), np.asarray(pz)
    assert np.all(pz == 8.0)
    assert np.all((px >= 2.0) & (px <= 10.0))
    assert np.all((py >= 4.0) & (py <= 12.0))
    _unit(dx, dy, dz)
    # isotropic: mean direction ~ 0
    assert abs(np.mean(np.asarray(dz))) < 0.05
    assert np.all(np.asarray(tau) >= 0)
    assert np.all(np.asarray(w) == 1.0)


def test_emit_extended_disc():
    key = jax.random.PRNGKey(1)
    px, py, pz, dx, dy, dz, tau, freq, w = emit_extended_disc(
        key, 8192, (16, 16, 32), axis=2, origin=16.0, scale_height=3.0)
    pz = np.asarray(pz)
    assert np.all((pz >= 0.0) & (pz <= 32.0))
    # Gaussian layer: sample std within 10% of the scale height
    assert np.std(pz) == pytest.approx(3.0, rel=0.1)
    assert np.mean(pz) == pytest.approx(16.0, abs=0.3)
    px = np.asarray(px)
    assert np.all((px >= 0.0) & (px <= 16.0))
    _unit(dx, dy, dz)


def test_emit_distant_star_rays_enter_box():
    key = jax.random.PRNGKey(2)
    shape = (16, 16, 16)
    star = (8.0, 8.0, 100.0)  # far above the +z face
    px, py, pz, dx, dy, dz, tau, freq, w = emit_distant_star(
        key, 4096, shape, star)
    w = np.asarray(w)
    assert np.mean(w) > 0.99  # flips make almost every ray hit
    hit = w > 0
    # entry points on the box surface (top face, since the star is above)
    pz_h = np.asarray(pz)[hit]
    assert np.all(pz_h <= 16.0 + 1e-3)
    assert np.mean(pz_h > 15.0) > 0.95
    # directions point downward into the box
    assert np.all(np.asarray(dz)[hit] < 0.0)
    # positions consistent: the ray from the star through direction
    px_h, py_h = np.asarray(px)[hit], np.asarray(py)[hit]
    t = (pz_h - star[2]) / np.asarray(dz)[hit]
    np.testing.assert_allclose(star[0] + t * np.asarray(dx)[hit], px_h,
                               atol=1e-2)
    np.testing.assert_allclose(star[1] + t * np.asarray(dy)[hit], py_h,
                               atol=1e-2)


def test_fractal_distribution_statistics():
    res = (16, 16, 16)
    counts = fractal_distribution(res, num_particles=65536, num_levels=4,
                                  fractal_dimension=2.6, seed=1)
    assert counts.shape == res
    total = counts.sum()
    assert total >= 65536  # N^levels >= num_particles
    # fractal: strongly clustered, not uniform — the top 10% of cells hold
    # far more than 10% of the points
    flat = np.sort(counts.ravel())[::-1]
    top = flat[: len(flat) // 10].sum()
    assert top / total > 0.3
    # different seeds give different structure
    counts2 = fractal_distribution(res, num_particles=65536, num_levels=4,
                                   seed=2)
    assert np.any(counts != counts2)


def test_apply_fractal_mask_conserves_mass():
    geom = GridGeometry(anchor=(0.0, 0.0, 0.0), sides=(1.0, 1.0, 1.0),
                        shape=(16, 16, 16), periodic=(False,) * 3)
    n = np.full(geom.shape, 100.0)
    masked = apply_fractal_mask(n, geom, num_particles=65536, num_levels=3,
                                fractal_fraction=1.0, seed=5)
    assert masked.shape == n.shape
    # mass conserved
    assert masked.sum() == pytest.approx(n.sum(), rel=1e-12)
    # substructure present
    assert masked.std() > 50.0
    # half-smooth mix keeps a floor of (1-f) * n everywhere
    half = apply_fractal_mask(n, geom, num_particles=65536, num_levels=3,
                              fractal_fraction=0.5, seed=5)
    assert half.sum() == pytest.approx(n.sum(), rel=1e-12)
    assert np.all(half >= 50.0 - 1e-9)
