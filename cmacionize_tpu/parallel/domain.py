"""Domain-decomposed Monte Carlo: grid slabs sharded over devices,
photon packets exchanged over the interconnect.

This is the TPU-native realization of the reference's *designed but never
finished* distributed subgrid mode (SURVEY §2.7 P4: `DensitySubGrid::pack/
unpack` MPI buffers, reserved TASKTYPE_SEND/RECV,
/root/reference/src/DensitySubGrid.hpp:965-1057, Task.hpp:50-52):

* the box is split into x-slabs, one per device on the mesh axis "x";
  the cell arrays (density, neutral fraction, tallies) live sharded —
  nothing is replicated;
* photon packets are traced through their local slab in lockstep; packets
  crossing a slab face are compacted into fixed-size send buffers and moved
  to the neighbor device with `ppermute` over ICI (the 27-direction buffer
  exchange of the reference collapses to ±x face exchanges for slabs);
* the superstep loop (trace → exchange → merge) runs until a `psum` of the
  live-packet count reaches zero — the bulk-synchronous equivalent of the
  reference's global termination test
  (/root/reference/src/TaskBasedIonizationSimulation.cpp:884-886).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from cmacionize_tpu.models import sources
from cmacionize_tpu.ops import ionization, traversal


def _compact(fields, mask, capacity):
    """Gather masked packets to the front; truncate/pad to `capacity`.

    fields: tuple of [N] arrays; mask [N] bool.  Returns (fields [capacity],
    active [capacity]).
    """
    order = jnp.argsort(~mask)  # actives first (stable)
    count = jnp.sum(mask)
    idx = order[:capacity]
    in_range = jnp.arange(capacity) < count
    out = tuple(f[idx] for f in fields)
    return out, in_range


def make_domain_mc_iteration(
    mesh,
    *,
    global_shape: Tuple[int, int, int],
    n_photons: int,
    sigma_dx: float,
    source_gpos: Tuple[float, float, float],
    jfac_scale: float,
    alpha: float,
    axis: str = "x",
    max_supersteps: int = 64,
):
    """Build a jitted domain-decomposed H-only MC iteration.

    Returns (step_fn, shardings) where step_fn(keys, neutral_fraction,
    number_density) → (new_neutral_fraction, jH, n_escaped); the field
    arguments and outputs are sharded along grid-x (PartitionSpec(axis)),
    keys is a [n_devices] key array.
    """
    n_dev = mesh.shape[axis]
    nx, ny, nz = global_shape
    assert nx % n_dev == 0, "grid x must divide over devices"
    nx_loc = nx // n_dev
    local_shape = (nx_loc, ny, nz)
    capacity = n_photons

    right_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    left_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def device_iteration(keys, neutral_fraction, number_density):
        my = jax.lax.axis_index(axis)
        x_offset = (my * nx_loc).astype(jnp.float32)
        key = keys[0]

        chi = (number_density * neutral_fraction * sigma_dx).reshape(-1)
        tally = jnp.zeros(chi.shape, chi.dtype)

        # emission: only the slab containing the source emits (point source)
        src_dev = int(source_gpos[0]) // nx_loc
        px, py, pz, dx, dy, dz, tau, _, weight = sources.emit_point_source(
            key, n_photons, source_gpos
        )
        px = px - x_offset  # to local slab coordinates
        is_mine = my == src_dev
        active0 = jnp.broadcast_to(is_mine, weight.shape)

        def trace_once(tally, px, py, pz, dx, dy, dz, tau, weight, active):
            cx = jnp.floor(px).astype(jnp.int32)
            cy = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, ny - 1)
            cz = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, nz - 1)
            cx_in = jnp.clip(cx, 0, nx_loc - 1)
            packets = traversal.PacketBatch(
                px, py, pz, cx_in, cy, cz, dx, dy, dz, tau, weight,
                active, jnp.zeros_like(active),
            )
            return traversal.trace_packets_auto(
                chi, packets, tally, shape=local_shape
            )

        def superstep(carry):
            step, tally, px, py, pz, dx, dy, dz, tau, weight, active, n_esc = carry
            tally, pk = trace_once(
                tally, px, py, pz, dx, dy, dz, tau, weight, active
            )
            # classify terminations: packets that left through a local x face
            # continue on the neighbor (unless it is the domain boundary)
            out_left = active & ~pk.absorbed & ~pk.active & (pk.cx < 0)
            out_right = active & ~pk.absorbed & ~pk.active & (pk.cx >= nx_loc)
            at_lo = my == 0
            at_hi = my == n_dev - 1
            go_left = out_left & ~at_lo
            go_right = out_right & ~at_hi
            escaped = (
                active & ~pk.absorbed & ~pk.active & ~go_left & ~go_right
            )
            n_esc = n_esc + jnp.sum(escaped, dtype=jnp.int32)

            fields = (pk.px, pk.py, pk.pz, pk.dx, pk.dy, pk.dz, pk.tau_left,
                      pk.weight)
            send_l, mask_l = _compact(fields, go_left, capacity)
            send_r, mask_r = _compact(fields, go_right, capacity)
            # shift local x coordinate into the receiver's frame
            send_l = (send_l[0] + nx_loc,) + send_l[1:]
            send_r = (send_r[0] - nx_loc,) + send_r[1:]

            recv_r = jax.lax.ppermute((*send_r, mask_r), axis, right_perm)
            recv_l = jax.lax.ppermute((*send_l, mask_l), axis, left_perm)
            # the wrap-around lanes of the circular permute carry only
            # inactive padding (go_left/right exclude domain boundaries)

            merged = tuple(
                jnp.concatenate([a, b]) for a, b in zip(recv_r[:-1], recv_l[:-1])
            )
            merged_mask = jnp.concatenate([recv_r[-1], recv_l[-1]])
            (px, py, pz, dx, dy, dz, tau, weight), active = _compact(
                merged, merged_mask, capacity
            )
            return (
                step + 1, tally, px, py, pz, dx, dy, dz, tau, weight, active,
                n_esc,
            )

        def cond(carry):
            step, active = carry[0], carry[10]
            n_live = jax.lax.psum(jnp.sum(active), axis)
            return jnp.logical_and(step < max_supersteps, n_live > 0)

        carry = (
            0, tally, px, py, pz, dx, dy, dz, tau, weight, active0,
            jnp.asarray(0, jnp.int32),
        )
        carry = jax.lax.while_loop(cond, superstep, carry)
        tally, n_esc = carry[1], carry[11]

        jH = tally.reshape(local_shape) * jfac_scale
        new_x = ionization.hydrogen_neutral_fraction(jH, number_density, alpha)
        return new_x, jH, jax.lax.psum(n_esc, axis)

    sharded = shard_map(
        device_iteration,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
        check_rep=False,
    )
    shardings = {
        "field": NamedSharding(mesh, P(axis)),
        "keys": NamedSharding(mesh, P(axis)),
    }
    return jax.jit(sharded), shardings
