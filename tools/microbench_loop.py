"""Isolate the while-loop step cost: which part of the traversal body is slow?"""

import functools
import time

import jax
import jax.numpy as jnp

P = 1 << 20
N_CELL = 64 * 64 * 64
STEPS = 32


def timed(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    px = jax.random.uniform(ks[0], (P,), jnp.float32) * 64
    py = jax.random.uniform(ks[1], (P,), jnp.float32) * 64
    pz = jax.random.uniform(ks[2], (P,), jnp.float32) * 64
    dx = jax.random.normal(ks[3], (P,), jnp.float32)
    idx = jax.random.randint(ks[4], (P,), 0, N_CELL, jnp.int32)
    val = jax.random.uniform(ks[5], (P,), jnp.float32)
    chi = jax.random.uniform(ks[6], (P // 4,), jnp.float32)  # 256k
    chi = jnp.concatenate([chi, chi, chi, chi])[:N_CELL]
    tally = jnp.zeros((N_CELL,), jnp.float32)

    # 1: pure elementwise loop (no gather/scatter), ~30 vector ops/step
    @jax.jit
    def loop_elementwise(px, py, pz, dxx):
        def body(i, c):
            a, b, cc, d = c
            for _ in range(10):
                t = jnp.minimum(a * 1.0001 + 0.1, jnp.maximum(b, cc))
                a, b, cc = b + d * 0.5, cc * 0.9999, t
            return a, b, cc, d

        return jax.lax.fori_loop(0, STEPS, body, (px, py, pz, dxx))

    # 2: gather-only loop
    @jax.jit
    def loop_gather(chi, idx, val):
        def body(i, c):
            v, ix = c
            g = chi[ix]
            v = v + g
            ix = (ix + 1) % N_CELL
            return v, ix

        return jax.lax.fori_loop(0, STEPS, body, (val, idx))

    # 3: scatter-only loop
    @jax.jit
    def loop_scatter(tally, idx, val):
        def body(i, c):
            t, ix = c
            t = t.at[ix].add(val, mode="drop")
            ix = (ix + 7) % N_CELL
            return t, ix

        return jax.lax.fori_loop(0, STEPS, body, (tally, idx))

    # 4: gather + scatter loop
    @jax.jit
    def loop_both(tally, chi, idx, val):
        def body(i, c):
            t, ix = c
            g = chi[ix]
            t = t.at[ix].add(val * g, mode="drop")
            ix = (ix + 7) % N_CELL
            return t, ix

        return jax.lax.fori_loop(0, STEPS, body, (tally, idx))

    # 5: while_loop variant of 4 (cond on any())
    @jax.jit
    def loop_both_while(tally, chi, idx, val):
        def cond(c):
            s, t, ix = c
            return s < STEPS

        def body(c):
            s, t, ix = c
            g = chi[ix]
            t = t.at[ix].add(val * g, mode="drop")
            ix = (ix + 7) % N_CELL
            return s + 1, t, ix

        return jax.lax.while_loop(cond, body, (0, tally, idx))

    for name, fn, args in [
        ("elementwise x30/step", loop_elementwise, (px, py, pz, dx)),
        ("gather only", loop_gather, (chi, idx, val)),
        ("scatter only", loop_scatter, (tally, idx, val)),
        ("gather+scatter fori", loop_both, (tally, chi, idx, val)),
        ("gather+scatter while", loop_both_while, (tally, chi, idx, val)),
    ]:
        dt = timed(fn, *args)
        print(f"{name:24s} {dt*1e3:9.2f} ms total  {dt/STEPS*1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
