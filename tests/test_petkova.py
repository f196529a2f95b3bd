"""Petkova exact SPH mapping + octree neighbor search tests.

Covers the analytic kernel-overlap integrals against numeric quadrature,
mass conservation of the deposit, partition-of-unity across adjacent cells,
the api.py "petkova" mapping switch, and octree sphere/knn queries against
brute force — the role of SPHArrayInterface's SPHARRAY_MAPPING_PETKOVA and
Octree.hpp/PointLocations.hpp.
"""

import numpy as np
import pytest

from cmacionize_tpu import native

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable (no g++)")


def _kernel(r, h):
    q = r / h
    s = 1.0 / (np.pi * h ** 3)
    return np.where(
        q < 1.0, s * (1.0 - 1.5 * q * q * (1.0 - 0.5 * q)),
        np.where(q < 2.0, s * 0.25 * (2.0 - q) ** 3, 0.0))


def _mc_fraction(p, h, lo, hi, n=400000, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    pts = lo + rng.random((n, 3)) * (hi - lo)
    r = np.linalg.norm(pts - p, axis=1)
    return float(_kernel(r, h).mean() * np.prod(hi - lo))


class TestBoxFraction:
    @pytest.mark.parametrize("p,h,lo,hi", [
        ((0.5, 0.5, 0.5), 0.1, (0, 0, 0), (1, 1, 1)),   # fully inside
        ((0.5, 0.5, 0.5), 0.3, (0, 0, 0), (0.5, 1, 1)),  # half box
        ((0.9, 0.8, 0.5), 0.3, (0.6, 0.6, 0.3), (1.2, 1.1, 0.9)),
        ((1.5, 0.5, 0.5), 0.4, (0, 0, 0), (1, 1, 1)),   # outside, tail
        ((0.7, 0.1, 0.2), 0.25, (0.4, 0, 0), (0.6, 0.3, 0.5)),
    ])
    def test_matches_numeric_quadrature(self, p, h, lo, hi):
        a = native.petkova_box_fraction(np.array(p, float), h,
                                        np.array(lo, float),
                                        np.array(hi, float))
        m = _mc_fraction(np.array(p, float), h, lo, hi)
        # MC noise at 4e5 samples dominates; the exactness cases below pin
        # the analytic integrals far tighter
        assert a == pytest.approx(m, abs=2e-2)

    def test_fully_contained_kernel_is_unity(self):
        a = native.petkova_box_fraction(
            np.array([0.5, 0.5, 0.5]), 0.05,
            np.zeros(3), np.ones(3))
        assert a == pytest.approx(1.0, abs=1e-10)

    def test_on_face_plane_is_half(self):
        a = native.petkova_box_fraction(
            np.array([0.0, 0.5, 0.5]), 0.2, np.zeros(3), np.ones(3))
        assert a == pytest.approx(0.5, abs=1e-10)

    def test_partition_of_unity_over_octants(self):
        """Fractions over the 8 octants of a containing box sum to 1."""
        p = np.array([0.43, 0.57, 0.51])
        h = 0.11
        total = 0.0
        for ox in (0, 1):
            for oy in (0, 1):
                for oz in (0, 1):
                    lo = np.array([ox, oy, oz]) * 0.5
                    total += native.petkova_box_fraction(p, h, lo, lo + 0.5)
        assert total == pytest.approx(1.0, abs=1e-9)


class TestDeposit:
    def test_mass_conservation(self):
        rng = np.random.default_rng(1)
        n = 200
        pos = rng.random((n, 3))
        m = rng.random(n) + 0.5
        h = np.full(n, 0.08)
        grid = native.petkova_deposit(
            pos, m, h, np.zeros(3), np.ones(3), np.array([8, 8, 8]),
            normalize=True)
        cell_volume = (1.0 / 8) ** 3
        np.testing.assert_allclose(grid.sum() * cell_volume, m.sum(),
                                   rtol=1e-10)

    def test_interior_particle_unnormalized_also_conserves(self):
        pos = np.array([[0.5, 0.5, 0.5]])
        m = np.array([3.0])
        h = np.array([0.1])
        grid = native.petkova_deposit(
            pos, m, h, np.zeros(3), np.ones(3), np.array([16, 16, 16]),
            normalize=False)
        cell_volume = (1.0 / 16) ** 3
        np.testing.assert_allclose(grid.sum() * cell_volume, 3.0, rtol=1e-9)

    def test_matches_per_cell_fractions(self):
        """Deposited density equals m * box_fraction / V for each cell."""
        pos = np.array([[0.31, 0.47, 0.55]])
        m = np.array([2.0])
        h = np.array([0.13])
        dims = np.array([4, 4, 4])
        grid = native.petkova_deposit(
            pos, m, h, np.zeros(3), np.ones(3), dims, normalize=False)
        cv = (1.0 / 4) ** 3
        for ix in range(4):
            for iy in range(4):
                for iz in range(4):
                    lo = np.array([ix, iy, iz]) * 0.25
                    f = native.petkova_box_fraction(pos[0], h[0], lo,
                                                    lo + 0.25)
                    assert grid[ix, iy, iz] * cv == pytest.approx(
                        m[0] * f, abs=1e-12)

    def test_api_mapping_switch(self):
        from cmacionize_tpu import api
        from cmacionize_tpu.models.grid import GridGeometry

        rng = np.random.default_rng(2)
        geometry = GridGeometry((0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (8, 8, 8))
        pos = rng.random((100, 3))
        m = np.ones(100)
        h = np.full(100, 0.1)
        density = api._deposit_petkova(geometry, pos, m, h)
        np.testing.assert_allclose(
            density.sum() * geometry.cell_volume, m.sum(), rtol=1e-10)


class TestOctree:
    def test_radius_neighbors_match_brute_force(self):
        rng = np.random.default_rng(3)
        pos = rng.random((2000, 3))
        tree = native.Octree(pos)
        for seed in range(5):
            c = rng.random(3)
            r = 0.15
            got = np.sort(tree.radius_neighbors(c, r))
            want = np.sort(np.nonzero(
                np.linalg.norm(pos - c, axis=1) <= r)[0])
            np.testing.assert_array_equal(got, want)

    def test_knn_matches_brute_force(self):
        rng = np.random.default_rng(4)
        pos = rng.random((1500, 3))
        tree = native.Octree(pos)
        c = np.array([0.4, 0.6, 0.5])
        idx, dist = tree.knn(c, 12)
        d_all = np.linalg.norm(pos - c, axis=1)
        want = np.sort(d_all)[:12]
        np.testing.assert_allclose(np.sort(dist), want, rtol=1e-12)
        assert np.all(np.diff(dist) >= 0)  # ascending

    def test_small_point_set(self):
        pos = np.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]])
        tree = native.Octree(pos)
        idx, dist = tree.knn(np.zeros(3), 5)
        assert len(idx) == 2
        assert idx[0] == 0
