"""Profile the stromgren iteration: where does the time go?

Breaks the h_only_iteration into its stages on a converged 64^3 state and
times each independently on the real device.
"""

import time

import jax
import jax.numpy as jnp

from cmacionize_tpu.models.ionization_simulation import (
    HOnlyConfig,
    HOnlyIonizationSimulation,
)
from cmacionize_tpu.ops import traversal
from cmacionize_tpu.utils.params import ParameterFile


def timed(fn, *args, n=5, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    params = ParameterFile("/root/repo/benchmarks/stromgren.param")
    config = HOnlyConfig.from_params(params)
    sim = HOnlyIonizationSimulation(config)
    dt, _ = timed(lambda: (sim.run(1), sim.neutral_fraction)[1], n=3)
    print(f"full iteration          {dt*1e3:9.1f} ms")

    # converged state
    sim2 = HOnlyIonizationSimulation(config)
    sim2.run(8)
    xh = sim2.neutral_fraction
    shape = sim2.geometry.shape
    n_p = config.n_photons
    print("shape", shape, "n_photons", n_p)

    key = jax.random.PRNGKey(7)

    # emulate emission: packets from center, isotropic, tau=-ln u
    @jax.jit
    def emit(key):
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, (n_p, 3))
        mu = 2.0 * u[:, 0] - 1.0
        phi = 2.0 * jnp.pi * u[:, 1]
        s = jnp.sqrt(jnp.maximum(0.0, 1.0 - mu * mu))
        direction = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), mu], axis=1)
        tau = -jnp.log(jax.random.uniform(k2, (n_p,), minval=1e-12))
        pos = jnp.full((n_p, 3), shape[0] / 2.0, jnp.float32)
        return pos, direction.astype(jnp.float32), tau.astype(jnp.float32)

    dt, (pos, dirn, tau) = timed(emit, key)
    print(f"emission sampling       {dt*1e3:9.1f} ms")

    # opacity field from converged state: chi = n_H * x * sigma * dx
    sigma_dx = config.cross_section * sim2.dx
    chi = (sim2.number_density * xh * sigma_dx).reshape(-1).astype(jnp.float32)
    print("chi stats", float(chi.min()), float(chi.max()))

    packets = traversal.make_packets(pos, dirn, tau, jnp.ones((n_p,), jnp.float32), shape)
    tally0 = jnp.zeros((shape[0] * shape[1] * shape[2],), jnp.float32)

    dt, (tly, pk) = timed(
        traversal.trace_packets, chi, packets, tally0,
        shape=shape, n=3,
    )
    print(f"trace_packets           {dt*1e3:9.1f} ms")

    # how many steps does the loop actually run? count actives per step
    def count_steps(chi, packets):
        def cond(c):
            step, pk = c
            return jnp.logical_and(step < 1000, jnp.any(pk.active))

        def body(c):
            step, pk = c
            t, pk = traversal.trace_packets(
                chi, pk, tally0, shape=shape, max_steps=1
            )
            return step + 1, pk

        steps, _ = jax.lax.while_loop(cond, body, (0, packets))
        return steps

    # cheaper: run max_steps=N for growing N and see live counts
    for cap in (8, 16, 32, 48, 64, 96, 128, 192, 256, 384):
        t, pk = traversal.trace_packets(chi, packets, tally0, shape=shape, max_steps=cap)
        live = int(jnp.sum(pk.active))
        print(f"  after {cap:4d} steps: live = {live}")
        if live == 0:
            break

    # per-step cost: time max_steps=16 vs 32 to get marginal step cost
    dt16, _ = timed(traversal.trace_packets, chi, packets, tally0, shape=shape, max_steps=16, n=3)
    dt32, _ = timed(traversal.trace_packets, chi, packets, tally0, shape=shape, max_steps=32, n=3)
    print(f"marginal step cost      {(dt32-dt16)/16*1e3:9.3f} ms/step (full width)")


if __name__ == "__main__":
    main()
