"""Traversal-kernel geometry and tally tests.

Modeled on the reference's testDensitySubGrid.cpp traversal checks: path
lengths through a uniform medium must match geometry exactly, and optical
depth accumulation must terminate packets at the sampled target.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmacionize_tpu.ops import traversal


def _trace_single(shape, chi_value, pos, direction, tau, periodic=(False, False, False)):
    ncell = int(np.prod(shape))
    chi = jnp.full((ncell,), chi_value, jnp.float32)
    position = jnp.asarray([pos], jnp.float32)
    dirn = jnp.asarray([direction], jnp.float32)
    dirn = dirn / jnp.linalg.norm(dirn)
    packets = traversal.make_packets(
        position, dirn, jnp.asarray([tau], jnp.float32),
        jnp.ones(1, jnp.float32), shape,
    )
    tally = jnp.zeros(ncell, jnp.float32)
    tally, packets = traversal.trace_packets(
        chi, packets, tally, shape=shape, periodic=periodic
    )
    return np.asarray(tally).reshape(shape), packets


def test_axis_ray_path_lengths():
    # transparent medium: ray along +x from cell center deposits 0.5 in its
    # starting cell and 1.0 in every other cell it crosses
    shape = (8, 4, 4)
    tally, packets = _trace_single(shape, 1e-20, (0.5, 1.5, 1.5), (1, 0, 0), 1e10)
    assert tally[0, 1, 1] == pytest.approx(0.5, rel=1e-5)
    for i in range(1, 8):
        assert tally[i, 1, 1] == pytest.approx(1.0, rel=1e-5)
    assert not bool(packets.absorbed[0])
    assert not bool(packets.active[0])  # escaped


def test_diagonal_ray_total_path():
    # body diagonal of a cube grid: total path = sqrt(3) * n
    shape = (4, 4, 4)
    tally, _ = _trace_single(shape, 1e-20, (0.01, 0.01, 0.01), (1, 1, 1), 1e10)
    assert tally.sum() == pytest.approx(np.sqrt(3) * (4 - 0.01), rel=1e-3)


def test_absorption_at_target_tau():
    # chi = 2 per cell: a packet with tau=3 travels 1.5 cells then stops
    shape = (8, 4, 4)
    tally, packets = _trace_single(shape, 2.0, (0.0 + 1e-6, 1.5, 1.5), (1, 0, 0), 3.0)
    assert bool(packets.absorbed[0])
    assert tally[0, 1, 1] == pytest.approx(1.0, rel=1e-4)
    assert tally[1, 1, 1] == pytest.approx(0.5, rel=1e-4)
    assert tally[2, 1, 1] == pytest.approx(0.0, abs=1e-7)
    # absorption point is at x = 1.5
    assert float(packets.px[0]) == pytest.approx(1.5, rel=1e-4)


def test_periodic_wrap():
    shape = (4, 4, 4)
    tally, packets = _trace_single(
        shape, 0.5, (0.5, 1.5, 1.5), (1, 0, 0), 4.0,
        periodic=(True, True, True),
    )
    # tau target 4.0 at chi 0.5 -> total path 8 cells: wraps around once
    assert bool(packets.absorbed[0])
    assert tally.sum() == pytest.approx(8.0, rel=1e-4)
    # each x-column cell crossed twice (plus the half start / final segment)
    assert tally[2, 1, 1] == pytest.approx(2.0, rel=1e-4)


def test_many_packets_conserve_path():
    # isotropic packets from the center of a transparent cube must all escape
    key = jax.random.PRNGKey(0)
    shape = (16, 16, 16)
    n = 512
    from cmacionize_tpu.models import sources

    px, py, pz, dx, dy, dz, tau, _, w = sources.emit_point_source(
        key, n, (8.0, 8.0, 8.0)
    )
    packets = traversal.make_packets(
        jnp.stack([px, py, pz], 1), jnp.stack([dx, dy, dz], 1),
        jnp.full((n,), 1e10, jnp.float32), w, shape,
    )
    chi = jnp.full((16**3,), 1e-20, jnp.float32)
    tally = jnp.zeros(16**3, jnp.float32)
    tally, packets = traversal.trace_packets(chi, packets, tally, shape=shape)
    assert not bool(jnp.any(packets.active))
    assert not bool(jnp.any(packets.absorbed))
    # every packet's path length is at least the inradius (8) and at most
    # the half-diagonal
    total = float(tally.sum())
    assert total >= 8.0 * n
    assert total <= np.sqrt(3) * 8 * n
