"""Is XLA TPU gather/scatter cost per-index or per-element?

Compares: scalar gather/scatter (1e6 x 1 elem) vs row gather/scatter
(1e6 x 64 elem rows, and fewer indices x wider rows), plus sorted indices.
All timings use value readback + marginal-step costing.
"""

import time

import jax
import jax.numpy as jnp

P = 1 << 20
N_CELL = 64**3


def time_marginal(make_fn, s1=8, s2=24, n=3):
    f1, f2 = make_fn(s1), make_fn(s2)
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
    return (d2 - d1) / (s2 - s1) * 1e3


def main():
    results = {}

    # scalar gather baseline, n_idx variable
    for n_idx in (P, P // 4, P // 16):
        tbl = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (N_CELL,))).astype(jnp.float32)

        def mk(steps, n_idx=n_idx, tbl=tbl):
            @jax.jit
            def f(key):
                idx = jax.random.randint(key, (n_idx,), 0, N_CELL, jnp.int32)
                def body(i, c):
                    v, ix = c
                    v = v + tbl[ix]
                    ix = (ix * 5 + 1) % N_CELL
                    return v, ix
                v, _ = jax.lax.fori_loop(0, steps, body, (jnp.zeros((n_idx,), jnp.float32), idx))
                return jnp.sum(v)
            return f

        m = time_marginal(mk)
        print(f"gather scalar n={n_idx:8d}            {m:8.2f} ms/step  ({n_idx/m/1e3:8.0f} K idx/ms)", flush=True)

    # row gather: table [R, W], gather n_idx rows of width W
    for (rows, width, n_idx) in [
        (4096, 64, P), (4096, 64, P // 4), (512, 512, P // 4), (4096, 128, P // 2),
    ]:
        tbl2 = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (rows, width))).astype(jnp.float32)

        def mk(steps, rows=rows, n_idx=n_idx, tbl2=tbl2):
            @jax.jit
            def f(key):
                idx = jax.random.randint(key, (n_idx,), 0, rows, jnp.int32)
                def body(i, c):
                    v, ix = c
                    v = v + jnp.sum(tbl2[ix], axis=1)
                    ix = (ix * 5 + 1) % rows
                    return v, ix
                v, _ = jax.lax.fori_loop(0, steps, body, (jnp.zeros((n_idx,), jnp.float32), idx))
                return jnp.sum(v)
            return f

        m = time_marginal(mk)
        print(f"gather rows [{rows}x{width}] n={n_idx:8d} {m:8.2f} ms/step  ({n_idx/m/1e3:8.0f} K idx/ms)", flush=True)

    # row scatter-add: updates [n_idx, W] into [R, W]
    for (rows, width, n_idx) in [(4096, 64, P), (4096, 64, P // 4)]:
        def mk(steps, rows=rows, width=width, n_idx=n_idx):
            @jax.jit
            def f(key):
                k1, k2 = jax.random.split(key)
                idx = jax.random.randint(k1, (n_idx,), 0, rows, jnp.int32)
                upd = jax.random.uniform(k2, (n_idx, width), jnp.float32)
                def body(i, c):
                    t, ix = c
                    t = t.at[ix].add(upd, mode="drop")
                    ix = (ix * 5 + 1) % rows
                    return t, ix
                t, _ = jax.lax.fori_loop(0, steps, body, (jnp.zeros((rows, width), jnp.float32), idx))
                return jnp.sum(t)
            return f

        m = time_marginal(mk)
        print(f"scatter rows [{rows}x{width}] n={n_idx:8d} {m:8.2f} ms/step ({n_idx/m/1e3:8.0f} K idx/ms)", flush=True)

    # sorted scalar gather
    tbl = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (N_CELL,))).astype(jnp.float32)

    def mk_sorted(steps):
        @jax.jit
        def f(key):
            idx = jnp.sort(jax.random.randint(key, (P,), 0, N_CELL, jnp.int32))
            def body(i, c):
                v, ix = c
                v = v + tbl[ix]
                ix = jnp.clip(ix + 1, 0, N_CELL - 1)  # stays sorted
                return v, ix
            v, _ = jax.lax.fori_loop(0, steps, body, (jnp.zeros((P,), jnp.float32), idx))
            return jnp.sum(v)
        return f

    m = time_marginal(mk_sorted)
    print(f"gather scalar sorted n={P}           {m:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
