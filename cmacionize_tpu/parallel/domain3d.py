"""3D domain decomposition: the grid tiled (sx, sy, sz) over a 3-axis device
mesh, photon packets exchanged over all six faces, the source tile replicated
for emission load balance.

Generalizes :mod:`cmacionize_tpu.parallel.domain` (x-slabs) to the
reference's full 3D subgrid tiling + 27-direction travel routing
(/root/reference/src/DensitySubGridCreator.hpp:80-118,
TravelDirections.hpp:49-105):

* the 27 travel directions collapse to THREE sequential face exchanges per
  superstep (x, then y, then z) — an edge/corner crossing resolves as two/
  three face hops inside one superstep, exactly the two-hop routing SURVEY
  §5 prescribes;
* packets carry GLOBAL cell-unit positions between traces; each device
  traces only the packets whose target tile is its own, in local
  coordinates against its local opacity shard;
* the reference's *subgrid copy* mechanism for contended source tiles
  (2^level replicas around sources, tallies summed back by
  ``update_original_counters``, DensitySubGridCreator.hpp:437-556) becomes
  **source-tile replication**: every device traces its own share of the
  emission through a psum-broadcast copy of the source tile's opacity, the
  copy tallies are psum-reduced onto the owning device, and only the
  packets that survive the source tile enter the face exchange.  This keeps
  all devices busy in superstep 0 instead of serializing emission on the
  source-owning device (SURVEY hard part #5).

Per-device packets-traced counters are returned so load skew is measurable
(the per-subgrid computational-cost counters of
/root/reference/src/DensitySubGrid.hpp:1616-1634).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cmacionize_tpu.models import sources
from cmacionize_tpu.ops import ionization, traversal
from cmacionize_tpu.parallel.domain import _compact

AXES = ("dx", "dy", "dz")


def make_mesh_3d(tiling: Tuple[int, int, int], devices=None):
    """Device mesh with axes ("dx", "dy", "dz") of shape ``tiling``."""
    import numpy as np
    from jax.sharding import Mesh

    if devices is None:
        devices = jax.devices()
    n = tiling[0] * tiling[1] * tiling[2]
    if len(devices) < n:
        raise ValueError(f"tiling {tiling} needs {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(tiling), AXES)


def _exchange_axis(fields, mask, target, my, n_dev, axis_name, capacity):
    """One bidirectional face exchange along a mesh axis.

    fields: tuple of [N] packet arrays (global coordinates); mask: [N] bool
    packets needing forwarding; target/my: tile coordinates on this axis.
    Packets with target < my go to the minus neighbor, target > my to the
    plus neighbor; everything else is kept.  Returns (fields, mask, overflow)
    with the carry re-compacted to the original width N.
    """
    n_carry = mask.shape[0]
    go_minus = mask & (target < my)
    go_plus = mask & (target > my)
    keep = mask & ~go_minus & ~go_plus

    send_m, mask_m, ov_m = _compact(fields, go_minus, capacity)
    send_p, mask_p, ov_p = _compact(fields, go_plus, capacity)

    plus_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    minus_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    recv_from_minus = jax.lax.ppermute((*send_p, mask_p), axis_name, plus_perm)
    recv_from_plus = jax.lax.ppermute((*send_m, mask_m), axis_name, minus_perm)

    merged = tuple(
        jnp.concatenate([k, a, b])
        for k, a, b in zip(fields, recv_from_minus[:-1], recv_from_plus[:-1])
    )
    merged_mask = jnp.concatenate(
        [keep, recv_from_minus[-1], recv_from_plus[-1]]
    )
    out_fields, out_mask, ov_c = _compact(merged, merged_mask, n_carry)
    return out_fields, out_mask, ov_m + ov_p + ov_c


def make_domain_mc_iteration_3d(
    mesh,
    *,
    global_shape: Tuple[int, int, int],
    n_photons: int,
    sigma_dx: float,
    source_gpos: Tuple[float, float, float],
    jfac_scale: float,
    alpha: float,
    max_supersteps: int = 64,
    capacity: int = 0,
):
    """Build a jitted 3D domain-decomposed H-only MC iteration.

    Returns (step_fn, shardings): step_fn(keys, neutral_fraction,
    number_density) -> (new_neutral_fraction, jH, diagnostics).  Field
    arguments/outputs are sharded over the 3 grid axes
    (PartitionSpec("dx","dy","dz")); ``keys`` is a [n_devices] key array
    sharded over the flattened mesh.  ``diagnostics`` contains global
    scalars (n_escaped, buffer_overflow, truncated_live) plus
    ``packets_traced`` [sx, sy, sz] — per-device traced-packet counts for
    load-skew measurement.
    """
    sx, sy, sz = (mesh.shape[a] for a in AXES)
    n_dev = sx * sy * sz
    nx, ny, nz = global_shape
    assert nx % sx == 0 and ny % sy == 0 and nz % sz == 0
    tnx, tny, tnz = nx // sx, ny // sy, nz // sz
    local_shape = (tnx, tny, tnz)
    n_loc = n_photons // n_dev
    # carry width: one device may transiently hold most in-flight packets
    # (e.g. the neighbors of an interior source tile right after the copy
    # phase), so the carry is sized on the GLOBAL photon count like the 1D
    # slab version; only the exchange buffers are narrow.
    n_carry = n_photons
    if capacity <= 0:
        capacity = max(4096, n_photons // 2 + n_photons // 32)
    capacity = min(capacity, n_carry)

    # tile containing the source (clamped inside the grid)
    st = (
        min(int(source_gpos[0]) // tnx, sx - 1),
        min(int(source_gpos[1]) // tny, sy - 1),
        min(int(source_gpos[2]) // tnz, sz - 1),
    )
    src_local = (
        source_gpos[0] - st[0] * tnx,
        source_gpos[1] - st[1] * tny,
        source_gpos[2] - st[2] * tnz,
    )

    def device_iteration(keys, neutral_fraction, number_density):
        mx = jax.lax.axis_index("dx")
        my = jax.lax.axis_index("dy")
        mz = jax.lax.axis_index("dz")
        x_off = (mx * tnx).astype(jnp.float32)
        y_off = (my * tny).astype(jnp.float32)
        z_off = (mz * tnz).astype(jnp.float32)
        is_owner = (mx == st[0]) & (my == st[1]) & (mz == st[2])

        chi = (number_density * neutral_fraction * sigma_dx).reshape(-1)
        tally = jnp.zeros(chi.shape, chi.dtype)
        n_traced = jnp.zeros((), jnp.int32)

        # ---- copy phase: every device traces its emission share through a
        # replicated copy of the source tile (psum broadcast of its chi)
        chi_src = jax.lax.psum(
            jnp.where(is_owner, chi, jnp.zeros_like(chi)), AXES
        )
        key = keys[0]
        px, py, pz, dx, dy, dz, tau, _, weight = sources.emit_point_source(
            key, n_loc, src_local
        )
        copy_tally = jnp.zeros_like(chi_src)
        pk0 = traversal.make_packets(
            jnp.stack([px, py, pz], 1), jnp.stack([dx, dy, dz], 1),
            tau, weight, local_shape,
        )
        copy_tally, pk0 = traversal.trace_packets_auto(
            chi_src, pk0, copy_tally, shape=local_shape
        )
        n_traced = n_traced + jnp.asarray(n_loc, jnp.int32)
        # owner absorbs the psum of all copy tallies (update_original_counters)
        tally = tally + jnp.where(
            is_owner, jax.lax.psum(copy_tally, AXES), jnp.zeros_like(tally)
        )
        # survivors re-enter in GLOBAL coordinates
        gx = pk0.px + jnp.float32(st[0] * tnx)
        gy = pk0.py + jnp.float32(st[1] * tny)
        gz = pk0.pz + jnp.float32(st[2] * tnz)
        fwd = ~pk0.absorbed & ~pk0.active  # left the source tile
        # escape test against the global box
        def _target(g, d, n_tile, n_axis):
            cell_eff = jnp.where(
                d >= 0, jnp.floor(g), jnp.ceil(g) - 1.0
            ).astype(jnp.int32)
            inside = (cell_eff >= 0) & (cell_eff < n_axis)
            return cell_eff // n_tile, inside

        def classify(gx, gy, gz, dx, dy, dz):
            tx, in_x = _target(gx, dx, tnx, nx)
            ty, in_y = _target(gy, dy, tny, ny)
            tz, in_z = _target(gz, dz, tnz, nz)
            return (tx, ty, tz), in_x & in_y & in_z

        (tx, ty, tz), inside = classify(gx, gy, gz, pk0.dx, pk0.dy, pk0.dz)
        pending = fwd & inside
        n_esc0 = jnp.sum(fwd & ~inside, dtype=jnp.int32)

        fields0 = (gx, gy, gz, pk0.dx, pk0.dy, pk0.dz, pk0.tau_left, pk0.weight)
        # widen the carry from the local emission share to the global width
        pad = n_carry - n_loc
        if pad > 0:
            fields0 = tuple(
                jnp.concatenate([f, jnp.zeros((pad,), f.dtype)])
                for f in fields0
            )
            pending = jnp.concatenate([pending, jnp.zeros((pad,), bool)])

        def superstep(carry):
            (step, tally, fields, pending, n_esc, n_over, n_traced) = carry
            gx, gy, gz, dx, dy, dz, tau, weight = fields
            (tx, ty, tz), inside = classify(gx, gy, gz, dx, dy, dz)
            pending = pending & inside
            n_esc = n_esc  # escapes are counted when packets terminate

            # forward along each axis in turn (two-hop edge/corner routing)
            fields, pending, ov = _exchange_axis(
                fields, pending, tx, mx, sx, "dx", capacity
            )
            gx, gy, gz, dx, dy, dz, tau, weight = fields
            (tx, ty, tz), _ = classify(gx, gy, gz, dx, dy, dz)
            fields, pending, ov2 = _exchange_axis(
                fields, pending, ty, my, sy, "dy", capacity
            )
            gx, gy, gz, dx, dy, dz, tau, weight = fields
            (tx, ty, tz), _ = classify(gx, gy, gz, dx, dy, dz)
            fields, pending, ov3 = _exchange_axis(
                fields, pending, tz, mz, sz, "dz", capacity
            )
            n_over = n_over + ov + ov2 + ov3

            # packets now on their target device become active and trace
            gx, gy, gz, dx, dy, dz, tau, weight = fields
            (tx, ty, tz), inside = classify(gx, gy, gz, dx, dy, dz)
            mine = pending & (tx == mx) & (ty == my) & (tz == mz)
            still_pending = pending & ~mine

            lpx = gx - x_off
            lpy = gy - y_off
            lpz = gz - z_off
            cx = jnp.clip(
                jnp.where(dx >= 0, jnp.floor(lpx), jnp.ceil(lpx) - 1.0
                          ).astype(jnp.int32), 0, tnx - 1)
            cy = jnp.clip(
                jnp.where(dy >= 0, jnp.floor(lpy), jnp.ceil(lpy) - 1.0
                          ).astype(jnp.int32), 0, tny - 1)
            cz = jnp.clip(
                jnp.where(dz >= 0, jnp.floor(lpz), jnp.ceil(lpz) - 1.0
                          ).astype(jnp.int32), 0, tnz - 1)
            pk = traversal.PacketBatch(
                lpx, lpy, lpz, cx, cy, cz, dx, dy, dz, tau, weight,
                mine, jnp.zeros_like(mine),
            )
            tally, pk = traversal.trace_packets_auto(
                chi, pk, tally, shape=local_shape
            )
            n_traced = n_traced + jnp.sum(mine, dtype=jnp.int32)

            ggx = pk.px + x_off
            ggy = pk.py + y_off
            ggz = pk.pz + z_off
            fwd = mine & ~pk.absorbed & ~pk.active
            (tx, ty, tz), inside = classify(ggx, ggy, ggz, pk.dx, pk.dy, pk.dz)
            n_esc = n_esc + jnp.sum(fwd & ~inside, dtype=jnp.int32)
            pending = still_pending | (fwd & inside)
            fields = (
                ggx, ggy, ggz, pk.dx, pk.dy, pk.dz, pk.tau_left, pk.weight
            )
            return (step + 1, tally, fields, pending, n_esc, n_over, n_traced)

        def cond(carry):
            step, pending = carry[0], carry[3]
            n_live = jax.lax.psum(jnp.sum(pending, dtype=jnp.int32), AXES)
            return jnp.logical_and(step < max_supersteps, n_live > 0)

        carry = (
            0, tally, fields0, pending, n_esc0,
            jnp.asarray(0, jnp.int32), n_traced,
        )
        carry = jax.lax.while_loop(cond, superstep, carry)
        _, tally, _, pending_end, n_esc, n_over, n_traced = carry
        truncated = jnp.sum(pending_end, dtype=jnp.int32)

        jH = tally.reshape(local_shape) * jfac_scale
        new_x = ionization.hydrogen_neutral_fraction(jH, number_density, alpha)
        diagnostics = {
            "n_escaped": jax.lax.psum(n_esc, AXES),
            "buffer_overflow": jax.lax.psum(n_over, AXES),
            "truncated_live": jax.lax.psum(truncated, AXES),
            "packets_traced": n_traced.reshape(1, 1, 1),
        }
        return new_x, jH, diagnostics

    sharded = shard_map(
        device_iteration,
        mesh=mesh,
        in_specs=(P(("dx", "dy", "dz")), P(*AXES), P(*AXES)),
        out_specs=(
            P(*AXES), P(*AXES),
            {
                "n_escaped": P(), "buffer_overflow": P(),
                "truncated_live": P(), "packets_traced": P(*AXES),
            },
        ),
        check_vma=False,
    )
    shardings = {
        "field": NamedSharding(mesh, P(*AXES)),
        "keys": NamedSharding(mesh, P(("dx", "dy", "dz"))),
    }
    return jax.jit(sharded), shardings
