"""Find the fastest in-kernel deposit (histogram) formulation.

Target: per DDA step, accumulate dep[t] into acc[lidx[t]] for T=1024
packets over W=128 cells; 7808 step-tiles per phase (K=8 x 976 tiles).
"""
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


def make(kernel, out_shape=(1, 128), extra_in=2):
    @jax.jit
    def run(*args):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * extra_in,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)

    return run


# D2: packets on sublanes [1024, 1], onehot [1024, 128] via mult+sum
def d2_kernel(dep_ref, lidx_ref, out_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1024, 128), 1)

    def body(i, acc):
        oh = (lanes == (lidx_ref[:] + i) % 128).astype(jnp.float32)
        return acc + jnp.sum(oh * dep_ref[:], axis=0, keepdims=True)

    out_ref[:] = jax.lax.fori_loop(0, NSTEP, body, jnp.zeros((1, 128), jnp.float32))


dep_s = jnp.ones((1024, 1), jnp.float32)
lidx_s = (jnp.arange(1024, dtype=jnp.int32).reshape(1024, 1) * 13) % 128
bench("D2 sublane-packets mult+sum", make(d2_kernel), dep_s, lidx_s)


# D3: where instead of mult
def d3_kernel(dep_ref, lidx_ref, out_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1024, 128), 1)
    zero = jnp.zeros((1024, 128), jnp.float32)

    def body(i, acc):
        d = jnp.where(lanes == (lidx_ref[:] + i) % 128, dep_ref[:], zero)
        return acc + jnp.sum(d, axis=0, keepdims=True)

    out_ref[:] = jax.lax.fori_loop(0, NSTEP, body, jnp.zeros((1, 128), jnp.float32))


bench("D3 sublane-packets where+sum", make(d3_kernel), dep_s, lidx_s)


# D4: accumulate [1024,128] inside loop, single reduce at end
def d4_kernel(dep_ref, lidx_ref, out_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1024, 128), 1)
    zero = jnp.zeros((1024, 128), jnp.float32)

    def body(i, acc):
        return acc + jnp.where(
            lanes == (lidx_ref[:] + i) % 128, dep_ref[:], zero
        )

    acc = jax.lax.fori_loop(0, NSTEP, body, zero)
    out_ref[:] = jnp.sum(acc, axis=0, keepdims=True)


bench("D4 defer reduce", make(d4_kernel), dep_s, lidx_s)


# D5: packets [8,128] native march layout; onehot [8,128,128] but bf16 + where
def d5_kernel(dep_ref, lidx_ref, out_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)
    zero = jnp.zeros((8, 128, 128), jnp.float32)

    def body(i, acc):
        li = (lidx_ref[:] + i) % 128
        d = jnp.where(lanes == li[:, :, None], dep_ref[:][:, :, None], zero)
        return acc + jnp.sum(d, axis=(0, 1)).reshape(1, 128)

    out_ref[:] = jax.lax.fori_loop(0, NSTEP, body, jnp.zeros((1, 128), jnp.float32))


dep_m = jnp.ones((8, 128), jnp.float32)
lidx_m = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 13) % 128
bench("D5 march-layout where", make(d5_kernel), dep_m, lidx_m)


# D6: march layout [8,128] -> reshape to [1024,1]-style via [128,8]? measure
# reshape cost: (8,128) -> (1024, 1)
def d6_kernel(dep_ref, lidx_ref, out_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1024, 128), 1)
    zero = jnp.zeros((1024, 128), jnp.float32)

    def body(i, acc):
        li = ((lidx_ref[:] + i) % 128).reshape(1024, 1)
        d = dep_ref[:].reshape(1024, 1)
        oh = jnp.where(lanes == li, d, zero)
        return acc + jnp.sum(oh, axis=0, keepdims=True)

    out_ref[:] = jax.lax.fori_loop(0, NSTEP, body, jnp.zeros((1, 128), jnp.float32))


bench("D6 march->sublane reshape", make(d6_kernel), dep_m, lidx_m)


# D7: MXU reduce: ones [1, 1024] @ masked [1024, 128]
def d7_kernel(dep_ref, lidx_ref, out_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1024, 128), 1)
    zero = jnp.zeros((1024, 128), jnp.float32)
    ones_row = jnp.ones((1, 1024), jnp.float32)

    def body(i, acc):
        d = jnp.where(lanes == (lidx_ref[:] + i) % 128, dep_ref[:], zero)
        return acc + jnp.dot(ones_row, d, preferred_element_type=jnp.float32)

    out_ref[:] = jax.lax.fori_loop(0, NSTEP, body, jnp.zeros((1, 128), jnp.float32))


bench("D7 MXU reduce", make(d7_kernel), dep_s, lidx_s)


# E: full DDA step math cost on [8,128] (no deposit) x NSTEP
def e_kernel(a_ref, b_ref, out_ref):
    def body(i, carry):
        px, py, pz, tau = carry
        dx = a_ref[:]
        dy = b_ref[:]
        dz = jnp.sqrt(jnp.maximum(1.0 - dx * dx - dy * dy, 0.0))
        tx = (jnp.floor(px) + 1.0 - px) / jnp.where(jnp.abs(dx) > 1e-12, dx, 1e-12)
        ty = (jnp.floor(py) + 1.0 - py) / jnp.where(jnp.abs(dy) > 1e-12, dy, 1e-12)
        tz = (jnp.floor(pz) + 1.0 - pz) / jnp.where(jnp.abs(dz) > 1e-12, dz, 1e-12)
        l_exit = jnp.minimum(jnp.abs(tx), jnp.minimum(jnp.abs(ty), jnp.abs(tz)))
        chi = jnp.maximum(px * 0.01, 1e-30)
        tau_cell = chi * l_exit
        absorbed = tau_cell >= tau
        lt = jnp.where(absorbed, tau / chi, l_exit)
        px = px + dx * lt
        py = py + dy * lt
        pz = pz + dz * lt
        tau = jnp.where(absorbed, 0.0, tau - tau_cell)
        return (px, py, pz, tau)

    px = a_ref[:] * 32.0
    out = jax.lax.fori_loop(0, NSTEP, body, (px, px + 1, px + 2, px * 9))
    out_ref[:] = out[0] + out[3]


def make_e():
    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            e_kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    return run


a = jnp.linspace(0.1, 0.9, 8 * 128).reshape(8, 128)
bench("E DDA math x NSTEP", make_e(), a, a * 0.5)
