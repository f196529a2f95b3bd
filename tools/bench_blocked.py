"""Compare blocked vs per-step traversal on the converged stromgren state.

Hard-sync timing (value readback).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cmacionize_tpu.models import sources
from cmacionize_tpu.ops import traversal

P = 1000000
NX = 64
SHAPE = (NX, NX, NX)
N_CELL = NX**3


def make_converged_chi():
    # analytic-ish converged stromgren profile: x_n(r) rising from 1e-6 to 1
    g = jnp.arange(NX) - NX / 2 + 0.5
    X, Y, Z = jnp.meshgrid(g, g, g, indexing="ij")
    r = jnp.sqrt(X**2 + Y**2 + Z**2)
    rs = 19.6  # stromgren radius in cells for the benchmark setup
    xn = jnp.where(
        r < rs, 1e-5 * jnp.exp(4.0 * r / rs), 1.0 - (1.0 - 0.3) * jnp.exp(-(r - rs))
    )
    xn = jnp.clip(xn, 1e-6, 1.0)
    dx = 3.086e17 / NX
    chi = (1e8 * xn * 6.3e-22 * dx).reshape(-1).astype(jnp.float32)
    return chi


CHI = make_converged_chi()


def emit(seed):
    key = jax.random.PRNGKey(seed)
    px, py, pz, dx, dy, dz, tau, _, w = sources.emit_point_source(
        key, P, (32.0, 32.0, 32.0)
    )
    return traversal.make_packets(
        jnp.stack([px, py, pz], 1), jnp.stack([dx, dy, dz], 1), tau, w, SHAPE
    )


def timed(fn, n=3):
    s = float(jnp.sum(fn(997)[0]))  # warm + compile
    t0 = time.perf_counter()
    for i in range(n):
        s = float(jnp.sum(fn(i)[0]))
    return (time.perf_counter() - t0) / n, s


def main():
    tly = jnp.zeros((N_CELL,), jnp.float32)

    def ref(seed):
        return traversal.trace_packets(CHI, emit(seed), tly, shape=SHAPE)

    d, s = timed(ref)
    print(f"per-step traversal        {d*1e3:9.1f} ms  (sum {s:.4e})", flush=True)

    for block, inner in [
        ((4, 4, 4), 4), ((4, 4, 4), 6), ((4, 4, 8), 6),
        ((4, 4, 8), 8), ((8, 8, 8), 8), ((2, 2, 16), 6), ((4, 4, 16), 8),
    ]:
        def blk(seed, block=block, inner=inner):
            return traversal.trace_packets_blocked(
                CHI, emit(seed), tly, shape=SHAPE, block=block, inner_steps=inner
            )

        try:
            d, s = timed(blk)
            print(
                f"blocked {str(block):12s} K={inner}   {d*1e3:9.1f} ms  (sum {s:.4e})",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(f"blocked {block} K={inner} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()


def main_adaptive():
    tly = jnp.zeros((N_CELL,), jnp.float32)

    def timed_a(fn, n=3):
        s = float(jnp.sum(fn(997)[0]))
        t0 = time.perf_counter()
        for i in range(n):
            s = float(jnp.sum(fn(i)[0]))
        return (time.perf_counter() - t0) / n, s

    for block, inner, p1 in [
        ((4, 4, 4), 4, 8), ((4, 4, 4), 4, 10), ((4, 4, 8), 6, 6), ((4, 4, 8), 6, 8),
    ]:
        def blk(seed, block=block, inner=inner, p1=p1):
            return traversal.trace_packets_blocked_adaptive(
                CHI, emit(seed), tly, shape=SHAPE, block=block,
                inner_steps=inner, phase1_phases=p1,
            )

        d, s = timed_a(blk)
        print(
            f"blocked-adaptive {str(block):12s} K={inner} p1={p1} "
            f"{d*1e3:9.1f} ms  (sum {s:.4e})",
            flush=True,
        )
