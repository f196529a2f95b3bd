"""Photon data parallelism: replicated grid, packets sharded over devices.

TPU-native equivalent of the reference's production MPI mode (grid replicated
on every rank, photon count distributed, per-ion tallies Allreduce'd —
/root/reference/src/IonizationSimulation.cpp:395-529,
/root/reference/src/MPICommunicator.hpp:207-360): each device emits and
traces its share of the packets through its replica of the opacity field,
tallies are `psum`'d over the mesh axis, and the (cheap, elementwise)
ionization balance runs redundantly on every device — exactly the
replicated-solve + gather the reference does, minus the gather (the result
is already identical everywhere).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from cmacionize_tpu.models import sources
from cmacionize_tpu.ops import ionization, traversal


def make_dp_iteration(
    mesh,
    *,
    shape: Tuple[int, int, int],
    periodic: Tuple[bool, bool, bool],
    n_photons_per_device: int,
    sigma_dx: float,
    source_gpos,
    jfac_scale: float,
    alpha: float,
    axis: str = "ph",
):
    """Build a jitted photon-DP Monte Carlo iteration over ``mesh``.

    Returns a function (keys, neutral_fraction, number_density) →
    (new_neutral_fraction, jH, n_escaped) where ``keys`` is a [n_devices]
    PRNG key array (one independent stream per device) and the field
    arguments/outputs are replicated.

    jfac_scale must already account for the *total* photon weight
    (n_photons_per_device × n_devices).
    """

    def device_iteration(keys, neutral_fraction, number_density):
        key = keys[0]
        chi = (number_density * neutral_fraction * sigma_dx).reshape(-1)
        px, py, pz, dx, dy, dz, tau, _, weight = sources.emit_point_source(
            key, n_photons_per_device, source_gpos
        )
        position = jnp.stack([px, py, pz], axis=1)
        direction = jnp.stack([dx, dy, dz], axis=1)
        packets = traversal.make_packets(position, direction, tau, weight, shape)
        tally = jnp.zeros(chi.shape, chi.dtype)
        tally, packets = traversal.trace_packets_auto(
            chi, packets, tally, shape=shape, periodic=periodic
        )
        # MPI_Allreduce of the per-ion tallies → psum over the mesh axis
        tally = jax.lax.psum(tally, axis)
        n_escaped = jax.lax.psum(jnp.sum(~packets.absorbed), axis)
        jH = tally.reshape(shape) * jfac_scale
        new_x = ionization.hydrogen_neutral_fraction(jH, number_density, alpha)
        return new_x, jH, n_escaped

    sharded = shard_map(
        device_iteration,
        mesh=mesh,
        in_specs=(P(axis), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
