"""Cone-marched Pallas traversal: the single-chip fast path.

TPU-native re-derivation of the reference's subgrid-buffer amortization
(`DensitySubGrid::interact`, /root/reference/src/DensitySubGrid.hpp:1137-1274
marches a whole 200-packet PhotonBuffer through one cache-resident subgrid
per task).  Here the amortization unit is a *direction-coherent packet
chunk*: emission (ops/emission_octa.py) orders packets so that C
consecutive lanes form a compact cone; a chunk then stays inside one S³
grid slab for many cell crossings, so the kernel can

* keep the ENTIRE opacity grid and tally grid resident in VMEM
  (64³ f32 = 1 MB each — no HBM gather/scatter at all, which is the
  measured wall of the XLA formulation: ~150 K indices/ms per-index cost,
  see BASELINE.md);
* fetch the chunk's current slab with one scalar-indexed dynamic slice per
  phase;
* compute EVERY slab cell's path length analytically in one vectorized
  pass (axis-separable slab test), and the cumulative optical depth at
  every cell entry with three direction-aware masked prefix-scans (the DDA
  visit order of a monotone ray is the componentwise partial order, so the
  3D inclusive summed-area table evaluated at a cell equals the path
  integral up to that cell's entry) — no serial per-cell marching at all.

Correct for ANY packet set (mixed direction signs just march with more
phases); coherent emission ordering is purely a performance property.

Estimator identical to ops/traversal.py `trace_packets` (per-cell ℓ·w
path-length deposits, absorption at target τ); tallies match to f32
reassociation round-off.

Packet state layout (row-major so chunk IO is two dense block loads):
  pf f32 [P, 8]: px py pz dx dy dz tau_left weight   (positions: cell units)
  pi i32 [P, 8]: cx cy cz state 0 0 0 0
  state: 0 = active, 1 = absorbed, 2 = escaped.
Lanes still active after max_phases stay state 0 and are finished by the
caller's fallback; all outputs are valid mid-flight continuations.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS_DIR = 1e-9


def _expand(arr_c_s, C, S, axis):
    """[C, S] per-axis values -> [C, S^3] with flat index ((gx*S)+gy)*S+gz."""
    if axis == 0:  # gx varies with stride S*S
        return jnp.broadcast_to(
            arr_c_s[:, :, None], (C, S, S * S)).reshape(C, S * S * S)
    if axis == 1:  # gy stride S
        return jnp.broadcast_to(
            arr_c_s[:, None, :, None], (C, S, S, S)).reshape(C, S * S * S)
    return jnp.broadcast_to(
        arr_c_s[:, None, :], (C, S * S, S)).reshape(C, S * S * S)


def _prefix_scan_steps(S):
    """(axis, coord_shift, lane_shift) for the inclusive prefix scans."""
    steps = []
    for axis, stride in ((2, 1), (1, S), (0, S * S)):
        shift = 1
        while shift < S:
            steps.append((axis, shift, shift * stride))
            shift *= 2
    return steps


def _make_kernel(shape, S, C, max_phases):
    nx, ny, nz = shape
    S3 = S * S * S
    scan_steps = _prefix_scan_steps(S)

    def kernel(chi_ref, pf_ref, pi_ref, opf_ref, opi_ref, tally_ref):
        prog = pl.program_id(0)

        @pl.when(prog == 0)
        def _():
            tally_ref[...] = jnp.zeros_like(tally_ref)

        pf = pf_ref[...]
        pi = pi_ref[...]
        dxv, dyv, dzv = pf[:, 3], pf[:, 4], pf[:, 5]
        wgt = pf[:, 7]
        sxp = dxv > 0.0  # per-lane sign booleans
        syp = dyv > 0.0
        szp = dzv > 0.0
        # signed, magnitude-clamped direction components
        dsx = jnp.where(sxp, jnp.maximum(dxv, _EPS_DIR),
                        jnp.minimum(dxv, -_EPS_DIR))
        dsy = jnp.where(syp, jnp.maximum(dyv, _EPS_DIR),
                        jnp.minimum(dyv, -_EPS_DIR))
        dsz = jnp.where(szp, jnp.maximum(dzv, _EPS_DIR),
                        jnp.minimum(dzv, -_EPS_DIR))

        g_arr = jax.lax.broadcasted_iota(
            jnp.int32, (1, S), 1).astype(jnp.float32)  # [1,S]
        # in-kernel scan masks (computed, not captured)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, S3), 1)
        lane_u = (lane // (S * S), (lane // S) % S, lane % S)
        scan_data = [
            (
                (lane_u[axis] >= shift).astype(jnp.float32),
                (lane_u[axis] < S - shift).astype(jnp.float32),
                lane_shift,
            )
            for axis, shift, lane_shift in scan_steps
        ]
        # per-lane scan direction per axis [C, 1]
        axis_fwd = (sxp[:, None], syp[:, None], szp[:, None])
        scan_axis = [axis for axis, _, _ in scan_steps]

        def cond(carry):
            phase = carry[0]
            state = carry[8]
            return jnp.logical_and(
                phase < max_phases, jnp.any(state == 0))

        def body(carry):
            (phase, px, py, pz, tau, cx, cy, cz, state) = carry
            active = state == 0

            # --- slab corner from the lagging active lane -----------------
            sgn_sum = (
                jnp.where(sxp, cx, -cx)
                + jnp.where(syp, cy, -cy)
                + jnp.where(szp, cz, -cz)
            )
            big = jnp.int32(1 << 30)
            metric = jnp.where(active, sgn_sum, big)
            lag = jnp.min(metric)
            is_lag = (metric == lag) & active
            lag_i = jnp.max(jnp.where(is_lag,
                                      jax.lax.broadcasted_iota(
                                          jnp.int32, (C,), 0), -1))
            pick = lambda v: jnp.sum(
                jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (C,), 0) == lag_i,
                    v, 0))
            lx, ly, lz = pick(cx), pick(cy), pick(cz)
            lfx = pick(sxp.astype(jnp.int32))
            lfy = pick(syp.astype(jnp.int32))
            lfz = pick(szp.astype(jnp.int32))
            bx = jnp.clip(jnp.where(lfx > 0, lx, lx - (S - 1)), 0, nx - S)
            by = jnp.clip(jnp.where(lfy > 0, ly, ly - (S - 1)), 0, ny - S)
            bz = jnp.clip(jnp.where(lfz > 0, lz, lz - (S - 1)), 0, nz - S)

            slab = chi_ref[pl.ds(bx, S), pl.ds(by, S), pl.ds(bz, S)]
            chi_row = slab.reshape(1, S3)

            # --- slab-local lane coordinates ------------------------------
            gx = cx - bx
            gy = cy - by
            gz = cz - bz
            in_slab = (
                active
                & (gx >= 0) & (gx < S)
                & (gy >= 0) & (gy < S)
                & (gz >= 0) & (gz < S)
            )
            march = in_slab
            marchf = march.astype(jnp.float32)

            qx = px - bx
            qy = py - by
            qz = pz - bz

            # per-axis entry/exit plane times [C, S]: cell g spans
            # [g, g+1]; entry plane is g for + travel, g+1 for −
            def plane_times(q, ds, sp):
                entry = g_arr + jnp.where(sp[:, None], 0.0, 1.0)
                t_in = (entry - q[:, None]) / ds[:, None]
                t_out = t_in + jnp.where(sp[:, None], 1.0, -1.0) / ds[:, None]
                return t_in, t_out

            tix, tox = plane_times(qx, dsx, sxp)
            tiy, toy = plane_times(qy, dsy, syp)
            tiz, toz = plane_times(qz, dsz, szp)

            t_in = jnp.maximum(
                _expand(tix, C, S, 0),
                jnp.maximum(_expand(tiy, C, S, 1), _expand(tiz, C, S, 2)),
            )
            t_out = jnp.minimum(
                _expand(tox, C, S, 0),
                jnp.minimum(_expand(toy, C, S, 1), _expand(toz, C, S, 2)),
            )
            t_lo = jnp.maximum(t_in, 0.0)
            ell = jnp.maximum(t_out - t_lo, 0.0)
            chiell = ell * chi_row
            tau_tot = jnp.sum(chiell * marchf[:, None], axis=1)
            absorbed_now = march & (tau < tau_tot)
            any_abs = jnp.any(absorbed_now)

            # slab exit time (exit plane S for + travel, 0 for −)
            t_exit = jnp.minimum(
                (jnp.where(sxp, float(S), 0.0) - qx) / dsx,
                jnp.minimum(
                    (jnp.where(syp, float(S), 0.0) - qy) / dsy,
                    (jnp.where(szp, float(S), 0.0) - qz) / dsz,
                ),
            )

            def with_absorption(_):
                # inclusive 3D prefix in per-lane travel order
                cum = chiell
                for (m_fwd, m_bwd, lane_shift), ax in zip(
                        scan_data, scan_axis):
                    fwd = pltpu.roll(cum, lane_shift, axis=1) * m_fwd
                    bwd = pltpu.roll(cum, S3 - lane_shift, axis=1) * m_bwd
                    cum = cum + jnp.where(axis_fwd[ax], fwd, bwd)
                cum_entry = cum - chiell
                tiny = jnp.float32(1e-30)
                frac = jnp.clip(
                    (tau[:, None] - cum_entry) / jnp.maximum(chiell, tiny),
                    0.0, 1.0)
                D = ell * frac * (wgt * marchf)[:, None]
                hit = (
                    (cum_entry <= tau[:, None])
                    & (tau[:, None] < cum)
                    & (ell > 0.0)
                )
                t_abs = jnp.sum(
                    jnp.where(
                        hit,
                        t_lo + (tau[:, None] - cum_entry)
                        / jnp.maximum(chi_row, tiny),
                        0.0,
                    ),
                    axis=1,
                )
                return D, t_abs

            def no_absorption(_):
                D = ell * (wgt * marchf)[:, None]
                return D, jnp.zeros_like(tau)

            D, t_abs = jax.lax.cond(
                any_abs, with_absorption, no_absorption, 0)

            dep = jnp.sum(D, axis=0).reshape(S, S, S)
            cur = tally_ref[pl.ds(bx, S), pl.ds(by, S), pl.ds(bz, S)]
            tally_ref[pl.ds(bx, S), pl.ds(by, S), pl.ds(bz, S)] = cur + dep

            # --- advance lanes --------------------------------------------
            t_use = jnp.where(absorbed_now, t_abs, t_exit)
            npx = jnp.where(march, px + dxv * t_use, px)
            npy = jnp.where(march, py + dyv * t_use, py)
            npz = jnp.where(march, pz + dzv * t_use, pz)
            # new cells: nudge along travel so wall-sitting resolves forward
            nudge = 1e-4
            ncx = jnp.floor(
                qx + dsx * t_use + jnp.where(sxp, nudge, -nudge)
            ).astype(jnp.int32) + bx
            ncy = jnp.floor(
                qy + dsy * t_use + jnp.where(syp, nudge, -nudge)
            ).astype(jnp.int32) + by
            ncz = jnp.floor(
                qz + dsz * t_use + jnp.where(szp, nudge, -nudge)
            ).astype(jnp.int32) + bz
            ncx = jnp.where(march, ncx, cx)
            ncy = jnp.where(march, ncy, cy)
            ncz = jnp.where(march, ncz, cz)
            outside = (
                (ncx < 0) | (ncx >= nx)
                | (ncy < 0) | (ncy >= ny)
                | (ncz < 0) | (ncz >= nz)
            )
            ntau = jnp.where(
                march, jnp.where(absorbed_now, 0.0, tau - tau_tot), tau)
            nstate = jnp.where(
                march,
                jnp.where(
                    absorbed_now, 1, jnp.where(outside, 2, state)),
                state,
            )
            return (phase + 1, npx, npy, npz, ntau,
                    ncx, ncy, ncz, nstate)

        carry = (
            jnp.int32(0), pf[:, 0], pf[:, 1], pf[:, 2], pf[:, 6],
            pi[:, 0], pi[:, 1], pi[:, 2], pi[:, 3],
        )
        carry = jax.lax.while_loop(cond, body, carry)
        (_, px, py, pz, tau, cx, cy, cz, state) = carry
        opf_ref[...] = jnp.stack(
            [px, py, pz, dxv, dyv, dzv, tau, wgt], axis=1)
        zeros = jnp.zeros_like(cx)
        opi_ref[...] = jnp.stack(
            [cx, cy, cz, state, zeros, zeros, zeros, zeros], axis=1)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("shape", "slab", "chunk", "max_phases", "interpret"),
)
def trace_packets_cone(
    chi3d: jnp.ndarray,
    pf: jnp.ndarray,
    pi: jnp.ndarray,
    *,
    shape: Tuple[int, int, int],
    slab: int = 8,
    chunk: int = 512,
    max_phases: int = 128,
    interpret: bool = False,
):
    """March direction-coherent packet chunks through a VMEM-resident grid.

    Args:
        chi3d: [nx, ny, nz] opacity (optical depth per cell-unit length).
        pf / pi: packet state (see module docstring); P % chunk == 0.
        shape, slab, chunk, max_phases: static geometry/config.

    Returns (tally3d, pf_out, pi_out). Lanes left with state 0 must be
    finished by the caller (ops/traversal.trace_packets does it in ~one
    no-op dispatch when there are none).
    """
    nx, ny, nz = shape
    P = pf.shape[0]
    if P % chunk:
        raise ValueError(f"P={P} not divisible by chunk={chunk}")
    if min(nx, ny, nz) < slab:
        raise ValueError("grid smaller than slab")
    kernel = _make_kernel(shape, slab, chunk, max_phases)
    n_prog = P // chunk
    opf, opi, tally = pl.pallas_call(
        kernel,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((nx, ny, nz), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, ny, nz), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, 8), jnp.float32),
            jax.ShapeDtypeStruct((P, 8), jnp.int32),
            jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32),
        ],
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(chi3d, pf, pi)
    return tally, opf, opi


def pack_packets(position, direction, tau, weight, shape):
    """[P,3] arrays (cell units) -> (pf, pi) row-major packet state."""
    P = position.shape[0]
    cx = jnp.clip(jnp.floor(position[:, 0]).astype(jnp.int32), 0,
                  shape[0] - 1)
    cy = jnp.clip(jnp.floor(position[:, 1]).astype(jnp.int32), 0,
                  shape[1] - 1)
    cz = jnp.clip(jnp.floor(position[:, 2]).astype(jnp.int32), 0,
                  shape[2] - 1)
    pf = jnp.concatenate(
        [position.astype(jnp.float32), direction.astype(jnp.float32),
         tau[:, None].astype(jnp.float32),
         weight[:, None].astype(jnp.float32)], axis=1)
    zeros = jnp.zeros((P,), jnp.int32)
    pi = jnp.stack([cx, cy, cz, zeros, zeros, zeros, zeros, zeros], axis=1)
    return pf, pi
