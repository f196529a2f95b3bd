"""Round-4 transport lever probe: emission-sorted packet cohorts.

Hypothesis (VERDICT r3 ask #5): sorting packets ONCE at emission so that
lanes with similar trajectories sit together improves the locality of the
per-phase row gather/scatter in the blocked march.  For a point source all
packets start in the same cell, so the only emission-time locality key is
the DIRECTION: sorting by direction octant/angle groups ray bundles that
will visit the same blocks phase after phase.

Measures, in one process (A/B valid): converged-stromgren full trace with
(a) unsorted emission, (b) packets sorted by direction key.  Also probes
whether this Mosaic toolchain has gained a dynamic scatter (the round-2/3
blocker for the sorted-cohort Pallas kernel).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from cmacionize_tpu.models import sources  # noqa: E402
from cmacionize_tpu.models.ionization_simulation import (  # noqa: E402
    HOnlyConfig,
    HOnlyIonizationSimulation,
)
from cmacionize_tpu.ops import traversal  # noqa: E402
from cmacionize_tpu.utils.params import ParameterFile  # noqa: E402


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, n=5):
    best = 1e30
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    params = ParameterFile("/root/repo/benchmarks/stromgren.param")
    config = HOnlyConfig.from_params(params)
    sim = HOnlyIonizationSimulation(config)
    sim.advance(8)  # converge the ionization structure
    sync(sim.neutral_fraction)
    shape = sim.geometry.shape
    sigma_dx = config.cross_section * sim.dx
    chi = (sim.number_density * sim.neutral_fraction * sigma_dx).reshape(-1)
    block = traversal.default_block(shape)
    K = traversal.default_inner_steps(block)
    n = config.n_photons

    def emit(key, sort_mode):
        px, py, pz, dx, dy, dz, tau, _, w = sources.emit_point_source(
            key, n, sim._source_gpos)
        if sort_mode == "octant":
            keybits = (
                (dx > 0).astype(jnp.uint32) * 4
                + (dy > 0).astype(jnp.uint32) * 2
                + (dz > 0).astype(jnp.uint32)
            )
        elif sort_mode == "angle":
            # 16x16 direction bins (azimuth x polar) — finer ray bundles
            az = jnp.floor((jnp.arctan2(dy, dx) / jnp.pi + 1.0) * 8.0)
            pol = jnp.floor((dz + 1.0) * 8.0)
            keybits = (az.astype(jnp.uint32) * 16
                       + jnp.clip(pol, 0, 15).astype(jnp.uint32))
        else:
            keybits = None
        if keybits is not None:
            iota = jax.lax.iota(jnp.uint32, n)
            order = (jax.lax.sort((keybits << 24) | iota)
                     & jnp.uint32(0xFFFFFF)).astype(jnp.int32)
            px, py, pz = px[order], py[order], pz[order]
            dx, dy, dz = dx[order], dy[order], dz[order]
            tau, w = tau[order], w[order]
        return traversal.make_packets(
            jnp.stack([px, py, pz], 1), jnp.stack([dx, dy, dz], 1),
            tau, w, shape)

    def trace(key, sort_mode):
        packets = emit(key, sort_mode)
        tally = jnp.zeros(chi.shape, chi.dtype)
        tally, _, _ = traversal.trace_packets_blocked_cascade(
            chi, packets, tally, shape=shape, block=block, inner_steps=K,
            shrink=3, n_stages=4)
        return tally

    key = jax.random.PRNGKey(17)
    for mode in (None, "octant", "angle", None):
        fn = jax.jit(lambda k, m=mode: trace(k, m))
        sync(fn(key))
        dt = timeit(lambda: sync(fn(key)))
        rate = n / dt
        print(f"sort={str(mode):7s}: {dt*1e3:7.1f} ms  ({rate:.3g} packets/s)")

    # Mosaic dynamic-scatter availability probe (round-2/3 blocker)
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu

        has = [name for name in dir(pltpu) if "scatter" in name.lower()]
        print("pallas tpu scatter-like symbols:", has or "none")
    except Exception as exc:  # pragma: no cover
        print("pallas probe failed:", exc)


if __name__ == "__main__":
    main()
