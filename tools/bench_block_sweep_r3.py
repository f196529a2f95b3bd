"""Round-3 block/inner-step sweep for the blocked traversal (back-to-back
A/B within one process — cross-window numbers are not comparable, see
BASELINE.md round-3 methodology).

Measures ms per converged-stromgren traversal (1e6 packets, 64^3) for
several (block, inner_steps) variants plus the production cascade.

Usage: python tools/bench_block_sweep_r3.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cmacionize_tpu.models.ionization_simulation import (
    HOnlyConfig,
    HOnlyIonizationSimulation,
)
from cmacionize_tpu.models import sources
from cmacionize_tpu.ops import traversal
from cmacionize_tpu.utils.params import ParameterFile


def main():
    params = ParameterFile("/root/repo/benchmarks/stromgren.param")
    config = HOnlyConfig.from_params(params)
    sim = HOnlyIonizationSimulation(config)
    sim.run(8)  # converge
    shape = config.geometry.shape
    sigma_dx = config.cross_section * sim.dx
    chi = (sim.number_density * sim.neutral_fraction * sigma_dx).reshape(-1)
    n = config.n_photons

    def make(key):
        px, py, pz, dx, dy, dz, tau, _, w = sources.emit_point_source(
            key, n, sim._source_gpos)
        return traversal.make_packets(
            jnp.stack([px, py, pz], 1), jnp.stack([dx, dy, dz], 1),
            tau, w, shape)

    variants = []

    def cascade_variant(label, **kw):
        def fn(pk, kw=kw):
            tally = jnp.zeros_like(chi)
            t, na, ne = traversal.trace_packets_blocked_cascade(
                chi, pk, tally, shape=shape, **kw)
            return t

        variants.append((label, fn))

    cascade_variant("cascade (4,4,4)K4 s4n3 [prod]")
    cascade_variant("cascade (4,4,4)K6", inner_steps=6)
    cascade_variant("cascade (8,4,4)K6", block=(8, 4, 4), inner_steps=6)
    cascade_variant("cascade (8,4,4)K8", block=(8, 4, 4), inner_steps=8)
    cascade_variant("cascade (4,4,8)K6", block=(4, 4, 8), inner_steps=6)
    cascade_variant("cascade s8n3", shrink=8, n_stages=3)

    # warm all variants (compile), then interleave timed repeats so window
    # drift hits every variant equally
    key0 = jax.random.PRNGKey(7)
    for name, fn in variants:
        pk = make(jax.random.fold_in(key0, hash(name) % 1000))
        float(jnp.sum(fn(pk)))
    results = {name: [] for name, _ in variants}
    for rep in range(2):
        for name, fn in variants:
            pk = make(jax.random.fold_in(key0, rep * 100 + hash(name) % 97))
            t0 = time.time()
            float(jnp.sum(fn(pk)))
            results[name].append(time.time() - t0)
    for name, _ in variants:
        best = min(results[name]) * 1e3
        print(f"{name:24s} best {best:8.1f} ms "
              f"({n / min(results[name]) / 1e6:.2f} Mpkt/s)")


if __name__ == "__main__":
    main()
