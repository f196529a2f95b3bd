"""Scatter-add cost vs index collision rate (point-source packets collide)."""

import time

import jax
import jax.numpy as jnp

P = 1 << 20
N_CELL = 64 * 64 * 64
STEPS = 16


def timed_vary(make_args, fn, n=3, warmup=1):
    for i in range(warmup):
        out = fn(*make_args(1000 + i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*make_args(i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


@jax.jit
def loop_scatter(tally, idx, val):
    def body(i, c):
        t, v = c
        t = t.at[idx].add(v, mode="drop")
        return t, v * 1.0001

    return jax.lax.fori_loop(0, STEPS, body, (tally, val))


def main():
    tally = jnp.zeros((N_CELL,), jnp.float32)

    for n_distinct in (N_CELL, 65536, 4096, 512, 64, 8, 1):
        def make_args(seed, nd=n_distinct):
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            idx = jax.random.randint(k1, (P,), 0, nd, jnp.int32)
            val = jax.random.uniform(k2, (P,), jnp.float32)
            return tally, idx, val

        dt = timed_vary(make_args, loop_scatter)
        print(
            f"distinct={n_distinct:7d} (dup x{P//n_distinct:7d}) "
            f"{dt/STEPS*1e3:9.3f} ms/scatter"
        )

    # sorted duplicate indices — does sortedness rescue collisions?
    for n_distinct in (512, 64):
        def make_args(seed, nd=n_distinct):
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            idx = jnp.sort(jax.random.randint(k1, (P,), 0, nd, jnp.int32))
            val = jax.random.uniform(k2, (P,), jnp.float32)
            return tally, idx, val

        dt = timed_vary(make_args, loop_scatter)
        print(f"sorted distinct={n_distinct:5d}        {dt/STEPS*1e3:9.3f} ms/scatter")


if __name__ == "__main__":
    main()
