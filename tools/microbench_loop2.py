"""Check whether the axon relay memoizes identical executions: vary inputs."""

import time

import jax
import jax.numpy as jnp

P = 1 << 20
N_CELL = 64 * 64 * 64
STEPS = 32


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    idx = jax.random.randint(ks[4], (P,), 0, N_CELL, jnp.int32)
    val = jax.random.uniform(ks[5], (P,), jnp.float32)
    chi = jax.random.uniform(ks[6], (N_CELL,), jnp.float32)
    tally = jnp.zeros((N_CELL,), jnp.float32)

    @jax.jit
    def loop_both(tally, chi, idx, val):
        def body(i, c):
            t, ix = c
            g = chi[ix]
            t = t.at[ix].add(val * g, mode="drop")
            ix = (ix + 7) % N_CELL
            return t, ix

        return jax.lax.fori_loop(0, STEPS, body, (tally, idx))

    # warmup
    out = loop_both(tally, chi, idx, val)
    jax.block_until_ready(out)

    # same inputs every call
    t0 = time.perf_counter()
    for _ in range(5):
        out = loop_both(tally, chi, idx, val)
    jax.block_until_ready(out)
    print(f"identical inputs : {(time.perf_counter()-t0)/5*1e3:9.2f} ms/call")

    # different inputs every call (chain: feed tally output back in)
    t = tally
    t0 = time.perf_counter()
    for _ in range(5):
        t, _ = loop_both(t, chi, idx, val)
    jax.block_until_ready(t)
    print(f"chained inputs   : {(time.perf_counter()-t0)/5*1e3:9.2f} ms/call")

    # vary val each call
    t0 = time.perf_counter()
    for i in range(5):
        out = loop_both(tally, chi, idx, val + float(i))
    jax.block_until_ready(out)
    print(f"varying inputs   : {(time.perf_counter()-t0)/5*1e3:9.2f} ms/call")


if __name__ == "__main__":
    main()
