"""Batched photon-packet traversal through a Cartesian grid.

TPU-native replacement for the reference's per-photon DDA ray march
(`DensitySubGrid::interact`, /root/reference/src/DensitySubGrid.hpp:1137-1274
and `CartesianDensityGrid::interact`,
/root/reference/src/CartesianDensityGrid.cpp:375-460):

* the reference traces one photon at a time to completion inside an
  OpenMP task; here **all packets advance one cell-crossing per lockstep
  iteration** of a `lax.while_loop`, as structure-of-arrays `[P]` vectors
  (positions in *cell units* so f32 has ample precision);
* per-cell path-length tallies (Σ ℓ·σ·w, the mean-intensity estimator) become
  deterministic scatter-adds into a flat tally array instead of
  atomics/cell-locks (/root/reference/src/IonizationVariables.hpp:306);
* a packet terminates by reaching its target optical depth τ = -ln ξ
  (absorption) or by leaving the box (escape).

The fast path used by the Strömgren-type benchmarks is single-channel: one
effective opacity field χ[cell] (optical depth per cell-unit length) and one
tally channel; the caller applies the σ·Δx scale factors.  The multi-ion
frequency-dependent path (per-packet cross sections) lives in
:func:`trace_packets_multifreq`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EPS_DIR = 1e-12


class PacketBatch(NamedTuple):
    """Structure-of-arrays photon packet batch (positions in cell units).

    Equivalent of a batched `PhotonPacket` array
    (/root/reference/src/PhotonPacket.hpp:45-71) without the per-ion cross
    sections (those live in the multifreq variant's extra arrays).
    """

    px: jnp.ndarray  # [P] position, cell units
    py: jnp.ndarray
    pz: jnp.ndarray
    cx: jnp.ndarray  # [P] int32 current cell index
    cy: jnp.ndarray
    cz: jnp.ndarray
    dx: jnp.ndarray  # [P] normalized direction
    dy: jnp.ndarray
    dz: jnp.ndarray
    tau_left: jnp.ndarray  # [P] remaining target optical depth
    weight: jnp.ndarray  # [P] statistical weight
    active: jnp.ndarray  # [P] bool — still travelling
    absorbed: jnp.ndarray  # [P] bool — reached target tau inside the box

    @property
    def size(self):
        return self.px.shape[0]


def make_packets(position, direction, tau_target, weight, shape) -> PacketBatch:
    """Build a batch from [P,3] position (cell units) / direction arrays."""
    px, py, pz = position[:, 0], position[:, 1], position[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
    cx = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, shape[0] - 1)
    cy = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, shape[1] - 1)
    cz = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, shape[2] - 1)
    active = jnp.ones_like(weight, dtype=bool)
    absorbed = jnp.zeros_like(weight, dtype=bool)
    return PacketBatch(
        px, py, pz, cx, cy, cz, dx, dy, dz, tau_target, weight, active, absorbed
    )


def _wall_distance(pos, cell, dirn):
    """Distance (in cell units) along dirn to the next wall on this axis."""
    positive = dirn > 0.0
    wall = (cell + positive.astype(jnp.int32)).astype(pos.dtype)
    safe = jnp.where(jnp.abs(dirn) > _EPS_DIR, dirn, _EPS_DIR)
    t = (wall - pos) / safe
    # a degenerate direction component never crosses its wall
    return jnp.where(jnp.abs(dirn) > _EPS_DIR, jnp.maximum(t, 0.0), jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("shape", "periodic", "max_steps")
)
def trace_packets(
    opacity: jnp.ndarray,
    packets: PacketBatch,
    tally: jnp.ndarray,
    *,
    shape: Tuple[int, int, int],
    periodic: Tuple[bool, bool, bool] = (False, False, False),
    max_steps: int = 0,
):
    """March all packets to termination, accumulating path-length tallies.

    Args:
        opacity: [ncell] flat χ — optical depth per unit cell-length, i.e.
            n_H·x_n·σ·Δx evaluated per cell (≥ 0).
        packets: the batch (positions in cell units).
        tally: [ncell] flat accumulator to add Σ ℓ(cell units)·w into.
        shape: grid shape (static).
        periodic: per-axis periodic wrap (static).
        max_steps: safety bound on lockstep iterations (0 → 4·(nx+ny+nz)).

    Returns:
        (tally, packets): updated tally and terminated batch (absorbed flags
        and final positions are valid for re-emission handling).
    """
    nx, ny, nz = shape
    if max_steps == 0:
        max_steps = 4 * (nx + ny + nz)
    tiny = jnp.asarray(1e-30, opacity.dtype)

    def cond(carry):
        step, _, pk = carry
        return jnp.logical_and(step < max_steps, jnp.any(pk.active))

    def body(carry):
        step, tly, pk = carry
        tx = _wall_distance(pk.px, pk.cx, pk.dx)
        ty = _wall_distance(pk.py, pk.cy, pk.dy)
        tz = _wall_distance(pk.pz, pk.cz, pk.dz)
        l_exit = jnp.minimum(tx, jnp.minimum(ty, tz))

        flat = (pk.cx * ny + pk.cy) * nz + pk.cz
        chi = jnp.maximum(opacity[flat], tiny)
        tau_cell = chi * l_exit
        absorbed_now = pk.active & (tau_cell >= pk.tau_left)
        l_travel = jnp.where(absorbed_now, pk.tau_left / chi, l_exit)

        deposit = jnp.where(pk.active, l_travel * pk.weight, 0.0)
        tly = tly.at[flat].add(deposit, mode="drop")

        # advance: land exactly on the crossed wall (axis of minimal t) or at
        # the absorption point inside the cell
        px = pk.px + pk.dx * l_travel
        py = pk.py + pk.dy * l_travel
        pz = pk.pz + pk.dz * l_travel
        cross_x = pk.active & ~absorbed_now & (l_exit == tx)
        cross_y = pk.active & ~absorbed_now & ~cross_x & (l_exit == ty)
        cross_z = pk.active & ~absorbed_now & ~cross_x & ~cross_y

        step_x = jnp.where(pk.dx > 0, 1, -1).astype(jnp.int32)
        step_y = jnp.where(pk.dy > 0, 1, -1).astype(jnp.int32)
        step_z = jnp.where(pk.dz > 0, 1, -1).astype(jnp.int32)
        cx = pk.cx + jnp.where(cross_x, step_x, 0)
        cy = pk.cy + jnp.where(cross_y, step_y, 0)
        cz = pk.cz + jnp.where(cross_z, step_z, 0)

        # snap the crossed coordinate onto the wall to avoid drift
        px = jnp.where(cross_x, jnp.where(pk.dx > 0, pk.cx + 1, pk.cx).astype(px.dtype), px)
        py = jnp.where(cross_y, jnp.where(pk.dy > 0, pk.cy + 1, pk.cy).astype(py.dtype), py)
        pz = jnp.where(cross_z, jnp.where(pk.dz > 0, pk.cz + 1, pk.cz).astype(pz.dtype), pz)

        # periodic wrap or escape
        if periodic[0]:
            px = jnp.where(cx < 0, px + nx, jnp.where(cx >= nx, px - nx, px))
            cx = jnp.mod(cx, nx)
        if periodic[1]:
            py = jnp.where(cy < 0, py + ny, jnp.where(cy >= ny, py - ny, py))
            cy = jnp.mod(cy, ny)
        if periodic[2]:
            pz = jnp.where(cz < 0, pz + nz, jnp.where(cz >= nz, pz - nz, pz))
            cz = jnp.mod(cz, nz)
        inside = (
            (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny) & (cz >= 0) & (cz < nz)
        )

        tau_left = jnp.where(absorbed_now, 0.0, pk.tau_left - tau_cell)
        active = pk.active & ~absorbed_now & inside
        absorbed = pk.absorbed | absorbed_now

        # freeze terminated packets: their final state (position, remaining
        # tau) is consumed by re-emission and domain-exchange handoff
        upd = pk.active
        px = jnp.where(upd, px, pk.px)
        py = jnp.where(upd, py, pk.py)
        pz = jnp.where(upd, pz, pk.pz)
        cx = jnp.where(upd, cx, pk.cx)
        cy = jnp.where(upd, cy, pk.cy)
        cz = jnp.where(upd, cz, pk.cz)
        tau_left = jnp.where(upd, tau_left, pk.tau_left)

        pk = PacketBatch(
            px, py, pz, cx, cy, cz, pk.dx, pk.dy, pk.dz,
            tau_left, pk.weight, active, absorbed,
        )
        return step + 1, tly, pk

    _, tally, packets = jax.lax.while_loop(cond, body, (0, tally, packets))
    return tally, packets


# ---------------------------------------------------------------------------
# Spectral (multi-frequency) traversal
# ---------------------------------------------------------------------------


class SpectralPacketBatch(NamedTuple):
    """Packet batch with per-packet H/He cross sections and a frequency bin.

    The multi-ion path-length tallies of the reference
    (`update_intensity_counters`, /root/reference/src/DensitySubGrid.hpp:585-620
    — one add per ion per cell crossing) are replaced by a *frequency-binned*
    tally: each crossing deposits ℓ·w once into (bin, cell); the per-ion
    mean-intensity and heating integrals are recovered afterwards by one
    [n_ion+2, n_bins] × [n_bins, n_cell] matmul on the MXU (see
    `spectral_tallies_to_ion_integrals`).  Opacity only involves H and He
    (cf. `get_optical_depth`, DensitySubGrid.hpp:557-583), carried per packet.
    """

    px: jnp.ndarray
    py: jnp.ndarray
    pz: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    cz: jnp.ndarray
    dx: jnp.ndarray
    dy: jnp.ndarray
    dz: jnp.ndarray
    tau_left: jnp.ndarray
    weight: jnp.ndarray
    sig_h: jnp.ndarray  # [P] sigma_H(nu) (m^2)
    sig_he: jnp.ndarray  # [P] sigma_He(nu) (m^2)
    fbin: jnp.ndarray  # [P] int32 frequency bin
    active: jnp.ndarray
    absorbed: jnp.ndarray

    @property
    def size(self):
        return self.px.shape[0]


def make_spectral_packets(
    position, direction, tau_target, weight, sig_h, sig_he, fbin, shape
) -> SpectralPacketBatch:
    px, py, pz = position[:, 0], position[:, 1], position[:, 2]
    dx, dy, dz = direction[:, 0], direction[:, 1], direction[:, 2]
    cx = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, shape[0] - 1)
    cy = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, shape[1] - 1)
    cz = jnp.clip(jnp.floor(pz).astype(jnp.int32), 0, shape[2] - 1)
    active = jnp.ones_like(weight, dtype=bool)
    absorbed = jnp.zeros_like(weight, dtype=bool)
    return SpectralPacketBatch(
        px, py, pz, cx, cy, cz, dx, dy, dz,
        tau_target, weight, sig_h, sig_he, fbin, active, absorbed,
    )


@functools.partial(
    jax.jit, static_argnames=("shape", "periodic", "max_steps", "n_bins")
)
def trace_packets_spectral(
    chi_h: jnp.ndarray,
    chi_he: jnp.ndarray,
    packets: SpectralPacketBatch,
    tally2d: jnp.ndarray,
    *,
    shape: Tuple[int, int, int],
    n_bins: int,
    periodic: Tuple[bool, bool, bool] = (False, False, False),
    max_steps: int = 0,
):
    """March a spectral batch; deposits ℓ·w into a [n_bins * n_cell] tally.

    chi_h / chi_he: flat [n_cell] fields n_H·x_H·Δx and n_H·A_He·x_He·Δx
    (optical depth per σ per cell-unit length) so that the per-packet opacity
    is χ = χ_H·σ_H(ν) + χ_He·σ_He(ν).
    """
    nx, ny, nz = shape
    ncell = nx * ny * nz
    if max_steps == 0:
        max_steps = 4 * (nx + ny + nz)
    tiny = jnp.asarray(1e-30, chi_h.dtype)

    def cond(carry):
        step, _, pk = carry
        return jnp.logical_and(step < max_steps, jnp.any(pk.active))

    def body(carry):
        step, tly, pk = carry
        tx = _wall_distance(pk.px, pk.cx, pk.dx)
        ty = _wall_distance(pk.py, pk.cy, pk.dy)
        tz = _wall_distance(pk.pz, pk.cz, pk.dz)
        l_exit = jnp.minimum(tx, jnp.minimum(ty, tz))

        flat = (pk.cx * ny + pk.cy) * nz + pk.cz
        chi = jnp.maximum(
            chi_h[flat] * pk.sig_h + chi_he[flat] * pk.sig_he, tiny
        )
        tau_cell = chi * l_exit
        absorbed_now = pk.active & (tau_cell >= pk.tau_left)
        l_travel = jnp.where(absorbed_now, pk.tau_left / chi, l_exit)

        deposit = jnp.where(pk.active, l_travel * pk.weight, 0.0)
        tly = tly.at[pk.fbin * ncell + flat].add(deposit, mode="drop")

        px = pk.px + pk.dx * l_travel
        py = pk.py + pk.dy * l_travel
        pz = pk.pz + pk.dz * l_travel
        cross_x = pk.active & ~absorbed_now & (l_exit == tx)
        cross_y = pk.active & ~absorbed_now & ~cross_x & (l_exit == ty)
        cross_z = pk.active & ~absorbed_now & ~cross_x & ~cross_y

        step_x = jnp.where(pk.dx > 0, 1, -1).astype(jnp.int32)
        step_y = jnp.where(pk.dy > 0, 1, -1).astype(jnp.int32)
        step_z = jnp.where(pk.dz > 0, 1, -1).astype(jnp.int32)
        cx = pk.cx + jnp.where(cross_x, step_x, 0)
        cy = pk.cy + jnp.where(cross_y, step_y, 0)
        cz = pk.cz + jnp.where(cross_z, step_z, 0)

        px = jnp.where(cross_x, jnp.where(pk.dx > 0, pk.cx + 1, pk.cx).astype(px.dtype), px)
        py = jnp.where(cross_y, jnp.where(pk.dy > 0, pk.cy + 1, pk.cy).astype(py.dtype), py)
        pz = jnp.where(cross_z, jnp.where(pk.dz > 0, pk.cz + 1, pk.cz).astype(pz.dtype), pz)

        if periodic[0]:
            px = jnp.where(cx < 0, px + nx, jnp.where(cx >= nx, px - nx, px))
            cx = jnp.mod(cx, nx)
        if periodic[1]:
            py = jnp.where(cy < 0, py + ny, jnp.where(cy >= ny, py - ny, py))
            cy = jnp.mod(cy, ny)
        if periodic[2]:
            pz = jnp.where(cz < 0, pz + nz, jnp.where(cz >= nz, pz - nz, pz))
            cz = jnp.mod(cz, nz)
        inside = (
            (cx >= 0) & (cx < nx) & (cy >= 0) & (cy < ny) & (cz >= 0) & (cz < nz)
        )

        tau_left = jnp.where(absorbed_now, 0.0, pk.tau_left - tau_cell)
        active = pk.active & ~absorbed_now & inside
        absorbed = pk.absorbed | absorbed_now

        # freeze terminated packets (see trace_packets)
        upd = pk.active
        px = jnp.where(upd, px, pk.px)
        py = jnp.where(upd, py, pk.py)
        pz = jnp.where(upd, pz, pk.pz)
        cx = jnp.where(upd, cx, pk.cx)
        cy = jnp.where(upd, cy, pk.cy)
        cz = jnp.where(upd, cz, pk.cz)
        tau_left = jnp.where(upd, tau_left, pk.tau_left)

        pk = SpectralPacketBatch(
            px, py, pz, cx, cy, cz, pk.dx, pk.dy, pk.dz,
            tau_left, pk.weight, pk.sig_h, pk.sig_he, pk.fbin, active, absorbed,
        )
        return step + 1, tly, pk

    _, tally2d, packets = jax.lax.while_loop(cond, body, (0, tally2d, packets))
    return tally2d, packets


def spectral_tallies_to_ion_integrals(
    tally2d, sigma_table, heating_weights, n_cell: int
):
    """[n_bins * n_cell] binned tallies → per-ion and heating integrals.

    sigma_table: [n_ion, n_bins] σ_i at the bin frequencies (m²).
    heating_weights: [2, n_bins] σ_{H,He}(ν)·(ν - ν_ion) for the photo-heating
    integrals (cf. DensitySubGrid.hpp:600-610).

    One MXU matmul replaces the reference's per-ion scatter adds.
    """
    t2 = tally2d.reshape(-1, n_cell)  # [n_bins, n_cell]
    weights = jnp.concatenate([sigma_table, heating_weights], axis=0)
    return jnp.dot(
        weights.astype(t2.dtype), t2, preferred_element_type=t2.dtype
    )  # [n_ion + 2, n_cell]


# ---------------------------------------------------------------------------
# Adaptive (width-compacting) traversal for the single-channel hot path
# ---------------------------------------------------------------------------

_POW2_WIDTHS = (1 << 13, 1 << 15, 1 << 17, 1 << 18, 1 << 19, 1 << 20, 1 << 21, 1 << 22)


def trace_packets_adaptive(
    opacity,
    packets: PacketBatch,
    tally,
    *,
    shape,
    periodic=(False, False, False),
    phase1_steps: int = 32,
):
    """Two-phase traversal: full-width march, then compact survivors.

    The lockstep loop pays full batch width every step even as packets
    terminate (the survival curve of a converged Strömgren state drops from
    100% to ~15% between steps ~25 and ~40).  After ``phase1_steps`` the live
    count is read back once and the survivors are compacted into the
    smallest sufficient power-of-two width before finishing the march —
    trading one host sync + one argsort for ~40% of the scatter/gather
    volume.

    Returns (tally, n_absorbed, n_escaped) — per-packet final state is NOT
    preserved across the compaction; use plain trace_packets when re-emission
    needs it.
    """
    n = packets.size
    tally, pk = trace_packets(
        opacity, packets, tally, shape=shape, periodic=periodic,
        max_steps=phase1_steps,
    )
    n_live = int(jnp.sum(pk.active))  # host sync (one round trip)
    n_absorbed = jnp.sum(pk.absorbed, dtype=jnp.int32)
    if n_live > 0:
        width = next(
            (w for w in _POW2_WIDTHS if w >= n_live and w < n), n
        )
        order = jnp.argsort(~pk.active)[:width]
        sub = PacketBatch(*(f[order] for f in pk))
        tally, sub = trace_packets(
            opacity, sub, tally, shape=shape, periodic=periodic
        )
        n_absorbed = n_absorbed + jnp.sum(sub.absorbed, dtype=jnp.int32)
    n_escaped = n - n_absorbed
    return tally, n_absorbed, n_escaped
