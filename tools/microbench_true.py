"""Trustworthy microbenchmarks: value-readback sync, marginal-step costing.

Every timing reads back a scalar (float()) to force true completion — under
the axon relay, block_until_ready alone does not guarantee execution finished.
Marginal per-step cost = (T(s2) - T(s1)) / (s2 - s1) cancels dispatch+readback
overhead.
"""

import sys
import time

import jax
import jax.numpy as jnp

P = 1 << 20
NX = 64
N_CELL = NX**3
_EPS_DIR = 1e-12


def run_loop(fn_body, steps, init):
    out = jax.lax.fori_loop(0, steps, fn_body, init)
    return out


def time_marginal(make_fn, s1=16, s2=48, n=3):
    """Returns marginal ms/step between step counts s1 and s2."""
    f1 = make_fn(s1)
    f2 = make_fn(s2)
    # warm both
    float(f1(jax.random.PRNGKey(999)))
    float(f2(jax.random.PRNGKey(998)))
    t0 = time.perf_counter()
    for i in range(n):
        float(f1(jax.random.PRNGKey(i)))
    d1 = (time.perf_counter() - t0) / n
    t0 = time.perf_counter()
    for i in range(n):
        float(f2(jax.random.PRNGKey(100 + i)))
    d2 = (time.perf_counter() - t0) / n
    return (d2 - d1) / (s2 - s1) * 1e3, d1 * 1e3


def main():
    chi = jnp.abs(jax.random.normal(jax.random.PRNGKey(5), (N_CELL,))) + 0.01
    chi = chi.astype(jnp.float32)

    def inputs(key):
        kk = jax.random.split(key, 6)
        idx = jax.random.randint(kk[0], (P,), 0, N_CELL, jnp.int32)
        val = jax.random.uniform(kk[1], (P,), jnp.float32)
        return idx, val

    # --- scatter only
    def mk_scatter(steps):
        @jax.jit
        def f(key):
            idx, val = inputs(key)
            def body(i, c):
                t, ix = c
                t = t.at[ix].add(val, mode="drop")
                ix = (ix * 5 + 1) % N_CELL
                return t, ix
            t, _ = jax.lax.fori_loop(0, steps, body, (jnp.zeros((N_CELL,), jnp.float32), idx))
            return jnp.sum(t)
        return f

    # --- gather only
    def mk_gather(steps):
        @jax.jit
        def f(key):
            idx, val = inputs(key)
            def body(i, c):
                v, ix = c
                v = v + chi[ix]
                ix = (ix * 5 + 1) % N_CELL
                return v, ix
            v, _ = jax.lax.fori_loop(0, steps, body, (val, idx))
            return jnp.sum(v)
        return f

    # --- elementwise only (10 fused ops)
    def mk_elem(steps):
        @jax.jit
        def f(key):
            idx, val = inputs(key)
            a = val
            b = val * 2.0
            def body(i, c):
                a, b = c
                for _ in range(5):
                    a, b = jnp.minimum(a * 1.0001 + 0.1, b), jnp.maximum(b * 0.9999, a)
                return a, b
            a, b = jax.lax.fori_loop(0, steps, body, (a, b))
            return jnp.sum(a)
        return f

    # --- int mod / div (index arithmetic)
    def mk_int(steps):
        @jax.jit
        def f(key):
            idx, val = inputs(key)
            def body(i, ix):
                return (ix * 5 + 1) % N_CELL
            ix = jax.lax.fori_loop(0, steps, body, idx)
            return jnp.sum(ix)
        return f

    # --- division (3 divs like wall distances)
    def mk_div(steps):
        @jax.jit
        def f(key):
            idx, val = inputs(key)
            a = val + 0.5
            def body(i, c):
                a, b = c
                t1 = (b - a) / jnp.where(jnp.abs(a) > _EPS_DIR, a, _EPS_DIR)
                t2 = (a - b) / jnp.where(jnp.abs(b) > _EPS_DIR, b, _EPS_DIR)
                t3 = a / (b + 1.0)
                return jnp.minimum(t1, t2) + 0.001, jnp.maximum(t2, t3)
            a, b = jax.lax.fori_loop(0, steps, body, (a, a * 1.5))
            return jnp.sum(a)
        return f

    for name, mk in [
        ("scatter", mk_scatter),
        ("gather", mk_gather),
        ("elem x10", mk_elem),
        ("int mod", mk_int),
        ("div x3", mk_div),
    ]:
        marg, base = time_marginal(mk)
        print(f"{name:10s} marginal {marg:8.3f} ms/step   (16-step call {base:7.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
