"""Does running the sim degrade later executions in the same process?"""

import time
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cmacionize_tpu.ops import traversal

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


g = jnp.arange(NX) - NX / 2 + 0.5
X, Y, Z = jnp.meshgrid(g, g, g, indexing="ij")
r = jnp.sqrt(X**2 + Y**2 + Z**2)
chi_synth = jnp.where(r < 24.0, 3e-4, 300.0).reshape(-1).astype(jnp.float32)
tly = jnp.zeros((N_CELL,), jnp.float32)


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


def run(chi, pk):
    return traversal.trace_packets(chi, pk, tly, shape=SHAPE)


def measure(tag):
    d = timed_vary(lambda s: (chi_synth, pk_synth(s)), run)
    print(f"[{tag}] synth/synth: {d*1e3:9.1f} ms", flush=True)


measure("A fresh")

# build + run the sim
from cmacionize_tpu.models.ionization_simulation import (
    HOnlyConfig,
    HOnlyIonizationSimulation,
)
from cmacionize_tpu.utils.params import ParameterFile

params = ParameterFile("/root/repo/benchmarks/stromgren.param")
config = HOnlyConfig.from_params(params)
sim = HOnlyIonizationSimulation(config)
t0 = time.perf_counter()
sim.run(2)
jax.block_until_ready(sim.neutral_fraction)
print(f"[B] sim.run(2): {(time.perf_counter()-t0)*1e3:9.1f} ms", flush=True)

measure("C after sim")

t0 = time.perf_counter()
sim.run(2)
jax.block_until_ready(sim.neutral_fraction)
print(f"[D] sim.run(2) again: {(time.perf_counter()-t0)*1e3:9.1f} ms", flush=True)
