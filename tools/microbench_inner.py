"""Cost of per-packet in-block ops: take_along_axis vs one-hot reduce on [P, W]."""

import time

import jax
import jax.numpy as jnp

P = 1 << 20


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
    for W in (64, 128):
        blk = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (P, W))).astype(jnp.float32)

        # take_along_axis on axis=1
        def mk_taa(steps, W=W):
            @jax.jit
            def g(key, blk):
                idx = jax.random.randint(key, (P,), 0, W, jnp.int32)
                def body(i, c):
                    v, ix = c
                    g = jnp.take_along_axis(blk, ix[:, None], axis=1)[:, 0]
                    return v + g, (ix + 1) % W
                v, _ = jax.lax.fori_loop(0, steps, body, (jnp.zeros((P,), jnp.float32), idx))
                return jnp.sum(v)
            return lambda key: g(key, blk)

        m = time_marginal(mk_taa)
        print(f"take_along_axis [P,{W}]     {m:8.3f} ms/step", flush=True)

        # one-hot reduce
        def mk_oh(steps, W=W):
            @jax.jit
            def g(key, blk):
                idx = jax.random.randint(key, (P,), 0, W, jnp.int32)
                lanes = jax.lax.broadcasted_iota(jnp.int32, (P, W), 1)
                def body(i, c):
                    v, ix = c
                    g = jnp.sum(jnp.where(lanes == ix[:, None], blk, 0.0), axis=1)
                    return v + g, (ix + 1) % W
                v, _ = jax.lax.fori_loop(0, steps, body, (jnp.zeros((P,), jnp.float32), idx))
                return jnp.sum(v)
            return lambda key: g(key, blk)

        m = time_marginal(mk_oh)
        print(f"one-hot reduce  [P,{W}]     {m:8.3f} ms/step", flush=True)

        # one-hot accumulate (deposit): D += onehot(ix) * val
        def mk_acc(steps, W=W):
            @jax.jit
            def f(key):
                k1, k2 = jax.random.split(key)
                idx = jax.random.randint(k1, (P,), 0, W, jnp.int32)
                val = jax.random.uniform(k2, (P,), jnp.float32)
                lanes = jax.lax.broadcasted_iota(jnp.int32, (P, W), 1)
                def body(i, c):
                    D, ix = c
                    D = D + jnp.where(lanes == ix[:, None], val[:, None], 0.0)
                    return D, (ix + 1) % W
                D, _ = jax.lax.fori_loop(0, steps, body, (jnp.zeros((P, W), jnp.float32), idx))
                return jnp.sum(D)
            return f

        m = time_marginal(mk_acc)
        print(f"one-hot deposit [P,{W}]     {m:8.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
