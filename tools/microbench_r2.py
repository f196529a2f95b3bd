"""Round-2 perf breakdown: converged-stromgren iteration components.

Times (with value-readback syncs, varied keys) on the real TPU:
  - emission (point source sampling)
  - blocked traversal at several (block, inner_steps) settings
  - H ionization balance solve

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_r2.py
"""

import time
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cmacionize_tpu.models.ionization_simulation import (
    HOnlyConfig, HOnlyIonizationSimulation)
from cmacionize_tpu.models import sources
from cmacionize_tpu.ops import traversal, ionization
from cmacionize_tpu.utils.params import ParameterFile


def timed(fn, *args, reps=4, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args, **kw)
        # value readback forces completion under the axon relay
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf).reshape(-1)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    params = ParameterFile("/root/repo/benchmarks/stromgren.param")
    config = HOnlyConfig.from_params(params)
    sim = HOnlyIonizationSimulation(config)
    sim.run(8)  # converge
    jax.block_until_ready(sim.neutral_fraction)

    shape = sim.geometry.shape
    n = config.n_photons
    sigma_dx = config.cross_section * sim.dx
    chi = (sim.number_density * sim.neutral_fraction * sigma_dx).reshape(-1)
    key = jax.random.PRNGKey(7)

    # --- emission ---
    emit = jax.jit(lambda k: sources.emit_point_source(k, n, sim._source_gpos))
    t = timed(emit, key)
    print(f"emission: {t*1e3:.1f} ms")

    px, py, pz, dx, dy, dz, tau, _, w = emit(key)
    pos = jnp.stack([px, py, pz], 1)
    dirn = jnp.stack([dx, dy, dz], 1)
    pk = traversal.make_packets(pos, dirn, tau, w, shape)
    tally0 = jnp.zeros(int(np.prod(shape)), jnp.float32)

    # --- per-step kernel ---
    t = timed(lambda p: traversal.trace_packets(chi, p, tally0, shape=shape), pk)
    print(f"per-step traversal: {t*1e3:.1f} ms")

    # --- blocked sweep ---
    for block, inner in [((4, 4, 4), 4), ((4, 4, 4), 6), ((4, 4, 4), 8),
                         ((8, 8, 8), 8), ((8, 8, 8), 12), ((4, 4, 8), 6)]:
        t = timed(
            lambda p: traversal.trace_packets_blocked(
                chi, p, tally0, shape=shape, block=block, inner_steps=inner),
            pk)
        print(f"blocked {block} K={inner}: {t*1e3:.1f} ms "
              f"({n/t/1e6:.2f}M pk/s)")

    # --- ionization solve ---
    jfac = (config.luminosity * config.cross_section * sim.dx
            / (n * sim.geometry.cell_volume))
    tally, _ = traversal.trace_packets_blocked(chi, pk, tally0, shape=shape)
    jH = tally.reshape(shape) * jfac
    solve = jax.jit(lambda j: ionization.hydrogen_neutral_fraction(
        j, sim.number_density, config.recombination_rate))
    t = timed(solve, jH)
    print(f"H balance solve: {t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
