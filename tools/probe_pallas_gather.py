"""Probe which dynamic-indexing ops Mosaic TPU accepts on this JAX version.

Each probe compiles and runs a tiny Pallas kernel; prints OK/FAIL + a speed
number for the survivors. Run on the real TPU (default platform).
"""
import functools
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices())


def timeit(fn, *args, reps=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else None
    out = fn(*args)
    jax.block_until_ready(out)
    # force a value readback to defeat axon memoization caveats: vary nothing,
    # but read a scalar back each rep
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe(name, builder):
    try:
        fn, args = builder()
        out = fn(*args)
        jax.block_until_ready(out)
        t = timeit(fn, *args)
        print(f"OK   {name}: {t*1e3:.3f} ms")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL {name}: {type(e).__name__}: {msg}")
        return False


P = 1 << 20  # 1M packets


# --- 1. take_along_axis on lanes: blk [T, W], idx [T, 1] -------------------
def b_taa_lanes():
    T, W = 8 * 1024, 128

    def kernel(blk_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(blk_ref[:], idx_ref[:], axis=1)

    @jax.jit
    def run(blk, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(blk, idx)

    blk = jnp.arange(T * W, dtype=jnp.float32).reshape(T, W)
    idx = jnp.tile(jnp.arange(T, dtype=jnp.int32).reshape(T, 1) % W, (1, 1))
    return run, (blk, idx)


# --- 2. row gather: table [4096, 64], idx [T] ------------------------------
def b_row_gather():
    T, NB, W = 8 * 1024, 4096, 64

    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:], :]

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    tab = jnp.arange(NB * W, dtype=jnp.float32).reshape(NB, W)
    idx = (jnp.arange(T, dtype=jnp.int32) * 7) % NB
    return run, (tab, idx)


# --- 3. flat gather from 2D table via per-lane 2D indices ------------------
def b_flat_gather_2d():
    T = 8 * 1024
    NS, NL = 2048, 128  # 262144-entry table as [2048, 128]

    def kernel(tab_ref, hi_ref, lo_ref, out_ref):
        out_ref[:] = tab_ref[hi_ref[:], lo_ref[:]]

    @jax.jit
    def run(tab, hi, lo):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((T // 128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, hi, lo)

    tab = jnp.arange(NS * NL, dtype=jnp.float32).reshape(NS, NL)
    flat = (jnp.arange(T, dtype=jnp.int32) * 97) % (NS * NL)
    hi = (flat // NL).reshape(T // 128, 128)
    lo = (flat % NL).reshape(T // 128, 128)
    return run, (tab, hi, lo)


# --- 4. gather along sublanes: table [2048, 128], idx [8, 128] per-lane row
def b_sublane_gather():
    NS, NL = 2048, 128

    def kernel(tab_ref, idx_ref, out_ref):
        # per-lane row selection: out[s, l] = tab[idx[s, l], l]
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, NL), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)

    tab = jnp.arange(NS * NL, dtype=jnp.float32).reshape(NS, NL)
    idx = (jnp.arange(8 * NL, dtype=jnp.int32).reshape(8, NL) * 13) % NS
    return run, (tab, idx)


# --- 5. per-lane scatter-add into VMEM scratch ------------------------------
def b_scatter_add():
    T, N = 8 * 1024, 262144

    def kernel(idx_ref, val_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)
        flat_idx = idx_ref[:]
        out2 = out_ref[:].reshape(-1)
        out_ref[:] = out2.at[flat_idx.reshape(-1)].add(
            val_ref[:].reshape(-1)
        ).reshape(out_ref.shape)

    @jax.jit
    def run(idx, val):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, val)

    idx = ((jnp.arange(T, dtype=jnp.int32) * 37) % N).reshape(T // 128, 128)
    val = jnp.ones((T // 128, 128), jnp.float32)
    return run, (idx, val)


# --- 6. XLA-level baselines on same shapes ----------------------------------
def b_xla_row_gather_1m():
    NB, W = 4096, 64
    tab = jnp.arange(NB * W, dtype=jnp.float32).reshape(NB, W)
    idx = (jnp.arange(P, dtype=jnp.int32) * 7) % NB

    @jax.jit
    def run(tab, idx):
        return tab[idx]

    return run, (tab, idx)


def b_xla_argsort_1m():
    keys = (jnp.arange(P, dtype=jnp.int32) * 2654435761) % 4096

    @jax.jit
    def run(k):
        return jnp.argsort(k)

    return run, (keys,)


def b_xla_sort_pairs_1m():
    keys = ((jnp.arange(P, dtype=jnp.int32) * 2654435761) % 4096)
    vals = jnp.arange(P, dtype=jnp.int32)

    @jax.jit
    def run(k, v):
        return jax.lax.sort_key_val(k, v)

    return run, (keys, vals)


if __name__ == "__main__":
    probe("1 take_along_axis lanes [8k,128]", b_taa_lanes)
    probe("2 row gather tab[idx] [8k rows of 64]", b_row_gather)
    probe("3 flat gather 2D idx [8k from 262k]", b_flat_gather_2d)
    probe("4 sublane take_along_axis [8x128 from 2048x128]", b_sublane_gather)
    probe("5 per-lane scatter-add [8k into 262k]", b_scatter_add)
    probe("6 XLA row gather 1M x 64", b_xla_row_gather_1m)
    probe("7 XLA argsort 1M int32", b_xla_argsort_1m)
    probe("8 XLA sort_key_val 1M", b_xla_sort_pairs_1m)
