"""Probe factorized deposit formulations (W=128 as 16x8) in march layout."""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSTEP = 7808


def bench(name, fn, *args, reps=3, sub=26.0):
    try:
        out = fn(*args)
        jax.block_until_ready(out)
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: {type(e).__name__}: {str(e).splitlines()[0][:200]}")
        return
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"OK   {name}: {min(ts)*1e3 - sub:.2f} ms/phase (raw {min(ts)*1e3:.1f})")


def make(kernel, out_shape):
    @jax.jit
    def run(*args):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)

    return run


dep_m = jnp.ones((8, 128), jnp.float32)
lidx_m = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 13) % 128


# D8: factorized 16x8: oh_hi [8,128,16], dep_lo [8,128,8];
# per-s dot_general contraction -> acc [16, 8]
def d8_kernel(dep_ref, lidx_ref, out_ref):
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 16), 2)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 8), 2)

    def body(i, acc):
        li = (lidx_ref[:] + i) % 128
        hi = (li >> 3)[:, :, None]
        lo = (li & 7)[:, :, None]
        oh_hi = (hi_iota == hi).astype(jnp.float32)  # [8,128,16]
        dep_lo = jnp.where(lo_iota == lo, dep_ref[:][:, :, None], 0.0)  # [8,128,8]
        add = jax.lax.dot_general(
            oh_hi, dep_lo,
            dimension_numbers=(((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [16, 8]
        return acc + add

    out_ref[:] = jax.lax.fori_loop(0, NSTEP, body, jnp.zeros((16, 8), jnp.float32))


bench("D8 factorized dot_general 2-dim contract", make(d8_kernel, (16, 8)), dep_m, lidx_m)


# D8b: per-s loop of 2D matmuls
def d8b_kernel(dep_ref, lidx_ref, out_ref):
    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 16), 2)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 8), 2)

    def body(i, acc):
        li = (lidx_ref[:] + i) % 128
        oh_hi = (hi_iota == (li >> 3)[:, :, None]).astype(jnp.float32)
        dep_lo = jnp.where(lo_iota == (li & 7)[:, :, None], dep_ref[:][:, :, None], 0.0)
        for s in range(8):
            acc = acc + jax.lax.dot_general(
                oh_hi[s], dep_lo[s],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    out_ref[:] = jax.lax.fori_loop(0, NSTEP, body, jnp.zeros((16, 8), jnp.float32))


bench("D8b per-s matmul loop", make(d8b_kernel, (16, 8)), dep_m, lidx_m)


# D12: reshape (16,8) -> (1,128) once (commit path sanity)
def d12_kernel(dep_ref, lidx_ref, out_ref):
    acc = jnp.zeros((16, 8), jnp.float32) + dep_ref[0, 0]
    out_ref[:] = acc.reshape(1, 128)


bench("D12 reshape (16,8)->(1,128)", make(d12_kernel, (1, 128)), dep_m, lidx_m)


# W2: Amanatides-Woo incremental DDA step cost
def w2_kernel(a_ref, b_ref, out_ref):
    dx = a_ref[:]
    dy = b_ref[:]
    dz = jnp.sqrt(jnp.maximum(1.0 - dx * dx - dy * dy, 1e-6))
    inv_dx = 1.0 / dx
    inv_dy = 1.0 / dy
    inv_dz = 1.0 / dz
    td_x = jnp.abs(inv_dx)
    td_y = jnp.abs(inv_dy)
    td_z = jnp.abs(inv_dz)

    def body(i, carry):
        tmx, tmy, tmz, tau, t_cur = carry
        t_exit = jnp.minimum(tmx, jnp.minimum(tmy, tmz))
        chi = jnp.maximum(tmx * 0.01, 1e-30)
        l_cell = t_exit - t_cur
        tau_cell = chi * l_cell
        absorbed = tau_cell >= tau
        cx = t_exit == tmx
        cy2 = jnp.logical_and(~cx, t_exit == tmy)
        cz2 = jnp.logical_and(~cx, ~cy2)
        tmx = jnp.where(cx, tmx + td_x, tmx)
        tmy = jnp.where(cy2, tmy + td_y, tmy)
        tmz = jnp.where(cz2, tmz + td_z, tmz)
        tau = jnp.where(absorbed, tau, tau - tau_cell)
        return (tmx, tmy, tmz, tau, t_exit)

    init = (td_x, td_y * 1.1, td_z * 1.2, a_ref[:] * 9, jnp.zeros_like(dx))
    out = jax.lax.fori_loop(0, NSTEP, body, init)
    out_ref[:] = out[0] + out[3]


bench("W2 incremental DDA", make(w2_kernel, (8, 128)), dep_m * 0.5, dep_m * 0.3)
