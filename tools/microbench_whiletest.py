"""Compare fori_loop vs while_loop(any(active)) and point-source vs uniform
inputs on the REAL trace_packets."""

import time

import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
from cmacionize_tpu.ops import traversal

P = 1 << 20
NX = NY = NZ = 64
SHAPE = (NX, NY, NZ)
N_CELL = NX * NY * NZ


def timed_vary(make_args, fn, n=3, warmup=1):
    for i in range(warmup):
        out = fn(*make_args(1000 + i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*make_args(i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def make_inputs(seed, point_source: bool, chi_mode: str):
    k = jax.random.PRNGKey(seed)
    kk = jax.random.split(k, 6)
    if point_source:
        pos = jnp.full((P, 3), NX / 2.0, jnp.float32)
    else:
        pos = jax.random.uniform(kk[0], (P, 3), jnp.float32) * NX
    u = jax.random.uniform(kk[1], (P, 2))
    mu = 2 * u[:, 0] - 1
    phi = 2 * jnp.pi * u[:, 1]
    s = jnp.sqrt(jnp.maximum(0.0, 1 - mu * mu))
    dirn = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), mu], 1).astype(jnp.float32)
    tau = -jnp.log(jax.random.uniform(kk[2], (P,), minval=1e-9)).astype(jnp.float32)
    if chi_mode == "uniform":
        chi = jax.random.uniform(kk[3], (N_CELL,), jnp.float32) * 0.5 + 0.05
    else:  # stromgren-like: tiny inside r<24, big outside
        g = jnp.arange(NX) - NX / 2 + 0.5
        X, Y, Z = jnp.meshgrid(g, g, g, indexing="ij")
        r = jnp.sqrt(X**2 + Y**2 + Z**2)
        chi = jnp.where(r < 24.0, 3e-4, 300.0).reshape(-1).astype(jnp.float32)
    w = jnp.ones((P,), jnp.float32)
    pk = traversal.make_packets(pos, dirn, tau, w, SHAPE)
    tly = jnp.zeros((N_CELL,), jnp.float32)
    return chi, pk, tly


def run_steps(n_steps):
    def fn(chi, pk, tly):
        return traversal.trace_packets(chi, pk, tly, shape=SHAPE, max_steps=n_steps)

    return fn


def main():
    for label, ps, cm in [
        ("uniform pos, uniform chi", False, "uniform"),
        ("point src, uniform chi", True, "uniform"),
        ("uniform pos, stromgren chi", False, "stromgren"),
        ("point src, stromgren chi", True, "stromgren"),
    ]:
        d16 = timed_vary(lambda s: make_inputs(s, ps, cm), run_steps(16))
        d48 = timed_vary(lambda s: make_inputs(s, ps, cm), run_steps(48))
        print(
            f"{label:28s} 16st={d16*1e3:8.1f} ms  48st={d48*1e3:8.1f} ms "
            f" marginal={(d48-d16)/32*1e3:7.3f} ms/step"
        )


if __name__ == "__main__":
    main()


def main2():
    # large max_steps (the production default 4*(nx+ny+nz)=768): does the
    # while_loop really early-exit on any(active)=False?
    for cap in (48, 64, 128, 768):
        d = timed_vary(
            lambda s: make_inputs(s, True, "stromgren"), run_steps(cap)
        )
        print(f"max_steps={cap:4d}   {d*1e3:9.1f} ms")


if __name__ == "__main__":
    main2()
