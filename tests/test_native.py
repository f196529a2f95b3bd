"""Native C++ SPH mapping kernels vs the numpy reference implementations."""

import numpy as np
import pytest

from cmacionize_tpu import native

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable (no g++)"
)

PC = 3.086e16


def test_native_m_over_v_matches_numpy():
    rng = np.random.default_rng(0)
    n = 5000
    positions = rng.uniform(-PC, PC, (n, 3))
    masses = rng.uniform(1.0, 2.0, n)
    anchor = np.array([-PC] * 3)
    sides = np.array([2 * PC] * 3)
    dims = np.array([8, 8, 8])

    grid = native.deposit_m_over_v(positions, masses, anchor, sides, dims)

    cell_volume = np.prod(sides / dims)
    idx = ((positions - anchor) / (sides / dims)).astype(int)
    idx = np.clip(idx, 0, dims - 1)
    expected = np.zeros(tuple(dims))
    np.add.at(expected, tuple(idx.T), masses)
    expected /= cell_volume
    np.testing.assert_allclose(grid, expected, rtol=1e-12)
    # exact mass conservation
    assert grid.sum() * cell_volume == pytest.approx(masses.sum(), rel=1e-12)


def test_native_sph_kernel_conserves_mass():
    rng = np.random.default_rng(1)
    n = 2000
    positions = rng.uniform(-0.7 * PC, 0.7 * PC, (n, 3))
    masses = rng.uniform(1.0, 2.0, n)
    h = np.full(n, 0.15 * PC)
    anchor = np.array([-PC] * 3)
    sides = np.array([2 * PC] * 3)
    dims = np.array([16, 16, 16])
    grid = native.deposit_sph_kernel(positions, masses, h, anchor, sides, dims)
    cell_volume = np.prod(sides / dims)
    assert grid.sum() * cell_volume == pytest.approx(masses.sum(), rel=1e-10)
    # smoother than NGP: no empty cells inside the particle cloud
    inner = grid[6:10, 6:10, 6:10]
    assert inner.min() > 0


def test_native_sample_grid():
    grid = np.arange(4 * 4 * 4, dtype=np.float64).reshape(4, 4, 4)
    anchor = np.zeros(3)
    sides = np.array([4.0, 4.0, 4.0])
    positions = np.array([[0.5, 0.5, 0.5], [3.5, 3.5, 3.5], [1.5, 0.5, 2.5]])
    out = native.sample_grid(grid, anchor, sides, positions)
    np.testing.assert_allclose(out, [grid[0, 0, 0], grid[3, 3, 3], grid[1, 0, 2]])
