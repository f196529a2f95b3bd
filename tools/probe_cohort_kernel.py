"""Probe the kernel mechanics needed by the cohort traversal design.

A: grid-step overhead with mostly-skipped steps (grid=(2048,))
B: take_along_axis lane gather [8,128] cost in a loop
C: manual DMA HBM->VMEM [8,16,128] with dynamic offset + compute + writeback
D: onehot deposit build+reduce at W=128
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices())


def bench(name, fn, *args, reps=3, sub=26.0, n_inner=1):
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
    t = (min(ts) * 1e3 - sub) / n_inner
    print(f"OK   {name}: {t:.3f} ms (raw {min(ts)*1e3:.1f})")


# --- A: grid overhead, 2048 steps, all skipped -----------------------------
def a_kernel(cnt_ref, out_ref):
    m = pl.program_id(0)

    @pl.when(m == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(cnt_ref[m] > 0)
    def _():
        out_ref[:] = out_ref[:] + 1.0


@jax.jit
def run_a(cnt):
    return pl.pallas_call(
        a_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(2048,),
            in_specs=[],
            out_specs=pl.BlockSpec(
                (8, 128), lambda m, cnt: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
    )(cnt)


cnt = jnp.zeros(2048, jnp.int32)
bench("A grid 2048 all-skip", run_a, cnt)
bench("A grid 2048 all-run", run_a, jnp.ones(2048, jnp.int32))


# --- B: take_along_axis [8,128] in a loop ----------------------------------
def b_kernel(tab_ref, idx_ref, out_ref):
    def body(i, acc):
        g = jnp.take_along_axis(tab_ref[:], (idx_ref[:] + i) % 128, axis=1)
        return acc + g

    out_ref[:] = jax.lax.fori_loop(0, 1000, body, jnp.zeros_like(out_ref))


@jax.jit
def run_b(tab, idx):
    return pl.pallas_call(
        b_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)


tab = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
idx = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 13) % 128
bench("B take_along 8x128 x1000", run_b, tab, idx, n_inner=1000)


# --- C: DMA streaming: 976 chunks of [8,16,128] with compute ----------------
NCHUNK = 976


def c_kernel(pk_hbm, out_hbm, acc_ref, buf, sem_in, sem_out):
    def body(j, acc):
        dma_in = pltpu.make_async_copy(
            pk_hbm.at[pl.ds(j * 8, 8)], buf, sem_in
        )
        dma_in.start()
        dma_in.wait()
        x = buf[:, 0, :]
        y = buf[:, 1, :]
        acc = acc + jnp.sum(x * y)
        buf[:, 2, :] = x + y
        dma_out = pltpu.make_async_copy(
            buf, out_hbm.at[pl.ds(j * 8, 8)], sem_out
        )
        dma_out.start()
        dma_out.wait()
        return acc

    acc_ref[0, 0] = jax.lax.fori_loop(0, NCHUNK, body, 0.0)


@jax.jit
def run_c(pk):
    return pl.pallas_call(
        c_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((NCHUNK * 8, 16, 128), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, 16, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(pk)


pk = jnp.ones((NCHUNK * 8, 16, 128), jnp.float32)
bench("C DMA stream 976 x [8,16,128] sync", run_c, pk)


# --- D: onehot deposit build+reduce W=128, K=8 steps x 976 tiles ------------
def d_kernel(dep_ref, lidx_ref, out_ref):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128, 128), 2)

    def body(i, acc):
        li = (lidx_ref[:] + i) % 128
        oh = (lanes == li[:, :, None]).astype(jnp.float32)
        d = oh * dep_ref[:][:, :, None]
        return acc + jnp.sum(d, axis=(0, 1))

    out_ref[0, :] = jax.lax.fori_loop(
        0, 8 * NCHUNK, body, jnp.zeros(128, jnp.float32)
    )


@jax.jit
def run_d(dep, lidx):
    return pl.pallas_call(
        d_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(dep, lidx)


dep = jnp.ones((8, 128), jnp.float32)
bench("D onehot W=128 K=8 x976", run_d, dep, idx)
