"""Bisect which input (real chi vs real packets) makes the traversal slow."""

import time
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cmacionize_tpu.models.ionization_simulation import (
    HOnlyConfig,
    HOnlyIonizationSimulation,
)
from cmacionize_tpu.models import sources
from cmacionize_tpu.ops import traversal
from cmacionize_tpu.utils.params import ParameterFile

P = 1 << 20
NX = 64
SHAPE = (NX, NX, NX)
N_CELL = NX**3


def timed_vary(make_args, fn, n=3, warmup=1):
    for i in range(warmup):
        out = fn(*make_args(1000 + i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*make_args(i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    params = ParameterFile("/root/repo/benchmarks/stromgren.param")
    config = HOnlyConfig.from_params(params)
    sim = HOnlyIonizationSimulation(config)
    sim.run(8)
    xh = sim.neutral_fraction
    sigma_dx = config.cross_section * sim.dx
    chi_real = (sim.number_density * xh * sigma_dx).reshape(-1).astype(jnp.float32)

    g = jnp.arange(NX) - NX / 2 + 0.5
    X, Y, Z = jnp.meshgrid(g, g, g, indexing="ij")
    r = jnp.sqrt(X**2 + Y**2 + Z**2)
    chi_synth = jnp.where(r < 24.0, 3e-4, 300.0).reshape(-1).astype(jnp.float32)

    def pk_real(seed):
        key = jax.random.PRNGKey(seed)
        px, py, pz, dx, dy, dz, tau, _, w = sources.emit_point_source(
            key, P, (32.0, 32.0, 32.0)
        )
        return traversal.make_packets(
            jnp.stack([px, py, pz], 1), jnp.stack([dx, dy, dz], 1), tau, w, SHAPE
        )

    def pk_synth(seed):
        k = jax.random.PRNGKey(seed)
        kk = jax.random.split(k, 3)
        pos = jnp.full((P, 3), 32.0, jnp.float32)
        u = jax.random.uniform(kk[0], (P, 2))
        mu = 2 * u[:, 0] - 1
        phi = 2 * jnp.pi * u[:, 1]
        s = jnp.sqrt(jnp.maximum(0.0, 1 - mu * mu))
        dirn = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), mu], 1).astype(jnp.float32)
        tau = -jnp.log(jax.random.uniform(kk[1], (P,), minval=1e-12)).astype(jnp.float32)
        return traversal.make_packets(pos, dirn, tau, jnp.ones((P,), jnp.float32), SHAPE)

    tly = jnp.zeros((N_CELL,), jnp.float32)

    def run(chi, pk):
        return traversal.trace_packets(chi, pk, tly, shape=SHAPE)

    for label, chi, pkf in [
        ("real chi, real emit", chi_real, pk_real),
        ("real chi, synth emit", chi_real, pk_synth),
        ("synth chi, real emit", chi_synth, pk_real),
        ("synth chi, synth emit", chi_synth, pk_synth),
    ]:
        d = timed_vary(lambda s, c=chi, f=pkf: (c, f(s)), run)
        print(f"{label:24s} {d*1e3:9.1f} ms")

    # how many steps do real-chi runs take? check live counts at caps
    pk = pk_real(0)
    for cap in (64, 96, 128, 256, 512, 768):
        t, out = traversal.trace_packets(chi_real, pk, tly, shape=SHAPE, max_steps=cap)
        live = int(jnp.sum(out.active))
        print(f"  real chi: after {cap} steps live={live}")
        if live == 0:
            break


if __name__ == "__main__":
    main()
