"""Micro-benchmark: tally deposit (scatter-add) and opacity gather options on TPU.

Explores candidate formulations for the traversal hot loop's deposit step
(see BASELINE.md bottleneck analysis):
  1. XLA scatter-add, random indices          (current implementation)
  2. XLA scatter-add, sorted indices
  3. sort + segment_sum
  4. gather (opacity lookup), random indices
  5. Pallas kernel: per-lane dynamic gather from a VMEM table (feasibility)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

N_CELL = 64 * 64 * 64
P = 1 << 20


def timed(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return dt, out


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (P,), 0, N_CELL, dtype=jnp.int32)
    idx_sorted = jnp.sort(idx)
    val = jax.random.uniform(k2, (P,), jnp.float32)
    tally = jnp.zeros((N_CELL,), jnp.float32)

    @jax.jit
    def scatter_rand(t, i, v):
        return t.at[i].add(v)

    @jax.jit
    def scatter_sorted(t, i, v):
        return t.at[i].add(v, indices_are_sorted=True)

    @jax.jit
    def sort_then_segsum(t, i, v):
        order = jnp.argsort(i)
        return t + jax.ops.segment_sum(
            v[order], i[order], num_segments=N_CELL, indices_are_sorted=True
        )

    @jax.jit
    def segsum_sorted(t, i, v):
        return t + jax.ops.segment_sum(
            v, i, num_segments=N_CELL, indices_are_sorted=True
        )

    @jax.jit
    def gather_rand(t, i):
        return jnp.sum(t[i])

    @jax.jit
    def gather_sorted(t, i):
        return jnp.sum(t[i], dtype=jnp.float32)

    for name, fn, args in [
        ("scatter-add random", scatter_rand, (tally, idx, val)),
        ("scatter-add sorted", scatter_sorted, (tally, idx_sorted, val)),
        ("argsort+segsum", sort_then_segsum, (tally, idx, val)),
        ("segsum presorted", segsum_sorted, (tally, idx_sorted, val)),
        ("gather random", gather_rand, (tally, idx)),
        ("gather sorted", gather_sorted, (tally, idx_sorted)),
    ]:
        try:
            dt, _ = timed(fn, *args)
            print(f"{name:24s} {dt*1e3:8.3f} ms   {P/dt/1e6:9.1f} M elem/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}")

    # --- Pallas feasibility: per-lane dynamic gather from a VMEM table
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TBL = N_CELL  # 256k f32 = 1 MB
        BLK = 1 << 13  # 8192 packets per grid step

        def gather_kernel(idx_ref, tbl_ref, out_ref):
            ii = idx_ref[:]  # [BLK] int32
            out_ref[:] = jnp.take(tbl_ref[:], ii, axis=0)

        @jax.jit
        def pallas_gather(tbl, i):
            return pl.pallas_call(
                gather_kernel,
                out_shape=jax.ShapeDtypeStruct((P,), jnp.float32),
                grid=(P // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda g: (g,), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK,), lambda g: (g,), memory_space=pltpu.VMEM),
            )(i, tbl)

        dt, out = timed(pallas_gather, tally + 1.0, idx)
        ref = (tally + 1.0)[idx]
        ok = bool(jnp.allclose(out, ref))
        print(f"pallas gather 1d        {dt*1e3:8.3f} ms   {P/dt/1e6:9.1f} M elem/s  correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"pallas gather 1d        FAILED: {type(e).__name__}: {e}")

    # --- Pallas 2D variant: table [2048, 128] gathered with take_along_axis
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        ROWS, LANES = N_CELL // 128, 128
        BLK = 1 << 13

        def gather2d_kernel(row_ref, lane_ref, tbl_ref, out_ref):
            # gather whole rows (dynamic on sublane dim), then pick lane
            r = row_ref[:]
            l = lane_ref[:]
            rows = jnp.take(tbl_ref[:], r, axis=0)  # [BLK, 128]
            onehot = (
                jax.lax.broadcasted_iota(jnp.int32, (BLK, LANES), 1)
                == l[:, None]
            ).astype(jnp.float32)
            out_ref[:] = jnp.sum(rows * onehot, axis=1)

        @jax.jit
        def pallas_gather2d(tbl2, rows, lanes):
            return pl.pallas_call(
                gather2d_kernel,
                out_shape=jax.ShapeDtypeStruct((P,), jnp.float32),
                grid=(P // BLK,),
                in_specs=[
                    pl.BlockSpec((BLK,), lambda g: (g,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK,), lambda g: (g,), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK,), lambda g: (g,), memory_space=pltpu.VMEM),
            )(rows, lanes, tbl2)

        tbl2 = (tally + 1.0).reshape(ROWS, LANES) + jnp.arange(ROWS * LANES, dtype=jnp.float32).reshape(ROWS, LANES)
        rows = idx // LANES
        lanes = idx % LANES
        dt, out = timed(pallas_gather2d, tbl2, rows, lanes)
        ref = tbl2.reshape(-1)[idx]
        ok = bool(jnp.allclose(out, ref))
        print(f"pallas gather 2d        {dt*1e3:8.3f} ms   {P/dt/1e6:9.1f} M elem/s  correct={ok}")
    except Exception as e:  # noqa: BLE001
        print(f"pallas gather 2d        FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
