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


class TestBlockedTraversal:
    """trace_packets_blocked must reproduce trace_packets exactly (same DDA,
    different accumulation structure)."""

    def _random_setup(self, seed, shape, n_p, periodic=(False, False, False)):
        key = jax.random.PRNGKey(seed)
        kk = jax.random.split(key, 5)
        chi = (jnp.abs(jax.random.normal(kk[0], (int(np.prod(shape)),))) * 0.5
               + 1e-3).astype(jnp.float32)
        pos = jax.random.uniform(kk[1], (n_p, 3), jnp.float32) * jnp.asarray(
            shape, jnp.float32
        )
        d = jax.random.normal(kk[2], (n_p, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        tau = -jnp.log(jax.random.uniform(kk[3], (n_p,), minval=1e-9))
        w = jax.random.uniform(kk[4], (n_p,), jnp.float32) + 0.5
        packets = traversal.make_packets(pos, d, tau.astype(jnp.float32), w, shape)
        tally = jnp.zeros((int(np.prod(shape)),), jnp.float32)
        return chi, packets, tally

    @pytest.mark.parametrize("periodic", [(False,) * 3, (True,) * 3])
    @pytest.mark.parametrize("block", [(4, 4, 4), (2, 2, 8)])
    def test_matches_reference_kernel(self, periodic, block):
        shape = (8, 8, 8)
        chi, packets, tally = self._random_setup(3, shape, 512, periodic)
        t_ref, pk_ref = traversal.trace_packets(
            chi, packets, tally, shape=shape, periodic=periodic
        )
        t_blk, pk_blk = traversal.trace_packets_blocked(
            chi, packets, tally, shape=shape, block=block, periodic=periodic
        )
        np.testing.assert_allclose(
            np.asarray(t_blk), np.asarray(t_ref), rtol=2e-4, atol=1e-6
        )
        np.testing.assert_array_equal(
            np.asarray(pk_blk.absorbed), np.asarray(pk_ref.absorbed)
        )
        np.testing.assert_array_equal(
            np.asarray(pk_blk.active), np.asarray(pk_ref.active)
        )
        np.testing.assert_allclose(
            np.asarray(pk_blk.px), np.asarray(pk_ref.px), rtol=1e-4, atol=1e-4
        )

    def test_single_ray_geometry(self):
        # same geometry check as the unblocked kernel
        shape = (8, 4, 4)
        ncell = int(np.prod(shape))
        chi = jnp.full((ncell,), 1e-20, jnp.float32)
        packets = traversal.make_packets(
            jnp.asarray([[0.5, 1.5, 1.5]], jnp.float32),
            jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32),
            jnp.asarray([1e10], jnp.float32),
            jnp.ones(1, jnp.float32),
            shape,
        )
        tally, pk = traversal.trace_packets_blocked(
            chi, packets, jnp.zeros(ncell, jnp.float32),
            shape=shape, block=(4, 4, 4),
        )
        t = np.asarray(tally).reshape(shape)
        assert t[0, 1, 1] == pytest.approx(0.5, rel=1e-5)
        for i in range(1, 8):
            assert t[i, 1, 1] == pytest.approx(1.0, rel=1e-5)
        assert not bool(pk.active[0])


def test_spectral_blocked_matches_reference():
    shape = (8, 8, 8)
    ncell = int(np.prod(shape))
    n_p, n_bins = 256, 4
    key = jax.random.PRNGKey(11)
    kk = jax.random.split(key, 8)
    chi_h = (jnp.abs(jax.random.normal(kk[0], (ncell,))) * 0.4 + 1e-3).astype(jnp.float32)
    chi_he = (jnp.abs(jax.random.normal(kk[1], (ncell,))) * 0.2 + 1e-4).astype(jnp.float32)
    pos = jax.random.uniform(kk[2], (n_p, 3), jnp.float32) * 8.0
    d = jax.random.normal(kk[3], (n_p, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    tau = -jnp.log(jax.random.uniform(kk[4], (n_p,), minval=1e-9)).astype(jnp.float32)
    w = jnp.ones((n_p,), jnp.float32)
    sig_h = jax.random.uniform(kk[5], (n_p,), jnp.float32) + 0.5
    sig_he = jax.random.uniform(kk[6], (n_p,), jnp.float32) * 0.5
    fbin = jax.random.randint(kk[7], (n_p,), 0, n_bins, jnp.int32)
    packets = traversal.make_spectral_packets(
        pos, d, tau, w, sig_h, sig_he, fbin, shape
    )
    t0 = jnp.zeros((n_bins * ncell,), jnp.float32)
    t_ref, pk_ref = traversal.trace_packets_spectral(
        chi_h, chi_he, packets, t0, shape=shape, n_bins=n_bins
    )
    t_blk, pk_blk = traversal.trace_packets_spectral_blocked(
        chi_h, chi_he, packets, t0, shape=shape, n_bins=n_bins, block=(4, 4, 4)
    )
    np.testing.assert_allclose(
        np.asarray(t_blk), np.asarray(t_ref), rtol=2e-4, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(pk_blk.absorbed), np.asarray(pk_ref.absorbed)
    )


def test_cascade_matches_plain_tallies():
    """trace_packets_blocked_cascade is estimator-identical to trace_packets:
    same deposits for the same emitted packets (f32 round-off), same
    absorbed/escaped counts."""
    shape = (16, 16, 16)
    key = jax.random.PRNGKey(7)
    n = 20000
    opacity = (
        0.05
        + 0.4 * jax.random.uniform(jax.random.fold_in(key, 1), (np.prod(shape),))
    )
    pos = jax.random.uniform(
        jax.random.fold_in(key, 2), (n, 3), minval=1.0, maxval=15.0
    )
    dirs = jax.random.normal(jax.random.fold_in(key, 3), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    tau = -jnp.log(
        jax.random.uniform(jax.random.fold_in(key, 4), (n,), minval=1e-6)
    )
    w = jnp.ones((n,), jnp.float32)
    packets = traversal.make_packets(pos, dirs, tau, w, shape)
    tally0 = jnp.zeros(int(np.prod(shape)), jnp.float32)

    ref_tally, ref_pk = traversal.trace_packets(
        opacity, packets, tally0, shape=shape
    )
    ref_abs = int(jnp.sum(ref_pk.absorbed))

    got_tally, n_abs, n_esc = traversal.trace_packets_blocked_cascade(
        opacity, packets, tally0, shape=shape, block=(4, 4, 4),
        shrink=2, n_stages=3,
    )
    # widths floor at 8192, so force smaller stages for this small batch
    np.testing.assert_allclose(
        np.asarray(got_tally), np.asarray(ref_tally), rtol=2e-5, atol=1e-4
    )
    assert int(n_abs) == ref_abs
    assert int(n_esc) == n - ref_abs


def test_cascade_exits_preserves_exit_state():
    """trace_packets_cascade_exits: same tallies as trace_packets AND the
    multiset of terminated-packet exit states matches lane for lane (the
    sharded slab exchange routes crossers from these fields)."""
    shape = (16, 16, 16)
    key = jax.random.PRNGKey(11)
    n = 30000  # > 8192*3 → a real multi-stage cascade at shrink=3
    opacity = (
        0.02
        + 0.2 * jax.random.uniform(jax.random.fold_in(key, 1), (np.prod(shape),))
    )
    pos = jax.random.uniform(
        jax.random.fold_in(key, 2), (n, 3), minval=1.0, maxval=15.0
    )
    dirs = jax.random.normal(jax.random.fold_in(key, 3), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    tau = -jnp.log(
        jax.random.uniform(jax.random.fold_in(key, 4), (n,), minval=1e-6)
    )
    w = jnp.ones((n,), jnp.float32)
    packets = traversal.make_packets(pos, dirs, tau, w, shape)
    tally0 = jnp.zeros(int(np.prod(shape)), jnp.float32)

    ref_tally, ref_pk = traversal.trace_packets(
        opacity, packets, tally0, shape=shape
    )
    got_tally, exits, valid, n_stuck = traversal.trace_packets_cascade_exits(
        opacity, packets, tally0, shape=shape
    )
    assert exits.size > n  # multi-stage concatenated view
    np.testing.assert_allclose(
        np.asarray(got_tally), np.asarray(ref_tally), rtol=2e-5, atol=1e-4
    )
    assert int(n_stuck) == 0
    assert int(jnp.sum(valid)) == n  # every packet terminated exactly once
    assert int(jnp.sum(valid & exits.absorbed)) == int(jnp.sum(ref_pk.absorbed))

    # escaped lanes: exit positions must match the reference march as a
    # multiset (the march is deterministic per packet; only lane order and
    # stage assignment differ)
    v = np.asarray(valid)
    esc_got = v & ~np.asarray(exits.absorbed)
    esc_ref = ~np.asarray(ref_pk.absorbed)
    for got_f, ref_f in (
        (exits.px, ref_pk.px), (exits.cx, ref_pk.cx), (exits.cy, ref_pk.cy),
    ):
        np.testing.assert_allclose(
            np.sort(np.asarray(got_f)[esc_got]),
            np.sort(np.asarray(ref_f)[esc_ref]),
            rtol=1e-5, atol=1e-5,
        )


def test_cascade_exits_inactive_lanes_never_valid():
    """Input-inactive lanes (exchange padding) must not surface as valid
    terminations — the double-count hazard of the concatenated view."""
    shape = (16, 16, 16)
    key = jax.random.PRNGKey(13)
    n = 4096
    opacity = jnp.full((int(np.prod(shape)),), 0.3, jnp.float32)
    pos = jax.random.uniform(
        jax.random.fold_in(key, 2), (n, 3), minval=1.0, maxval=15.0
    )
    dirs = jax.random.normal(jax.random.fold_in(key, 3), (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    tau = -jnp.log(
        jax.random.uniform(jax.random.fold_in(key, 4), (n,), minval=1e-6)
    )
    w = jnp.ones((n,), jnp.float32)
    packets = traversal.make_packets(pos, dirs, tau, w, shape)
    active = jnp.arange(n) < n // 3  # only the first third is real
    packets = packets._replace(active=active)
    tally0 = jnp.zeros(int(np.prod(shape)), jnp.float32)
    _, exits, valid, n_stuck = traversal.trace_packets_cascade_exits(
        opacity, packets, tally0, shape=shape
    )
    assert int(n_stuck) == 0
    assert int(jnp.sum(valid)) == n // 3
