"""A/B plain blocked march vs cascade variants on the starbench 64^3 state.

Times a full radiation update (nloop fused loops) with each traversal
variant, at an early-expansion state and optionally a later one.

Usage: PYTHONPATH=/root/repo python tools/probe_cascade_r4.py [steps_in ...]
"""

import importlib.util
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from cmacionize_tpu import constants  # noqa: E402
from cmacionize_tpu.models import sources  # noqa: E402
from cmacionize_tpu.ops import hydro, ionization, traversal  # noqa: E402

spec = importlib.util.spec_from_file_location(
    "run_starbench", "/root/repo/benchmarks/run_starbench.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, n=3):
    best = 1e30
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def radiation_update(key, nd, xh, cfg, sim, tracer):
    shape = sim.geometry.shape
    sigma_dx = cfg.cross_section * sim.dx
    jfac_scale = (cfg.luminosity * cfg.cross_section * sim.dx
                  / (cfg.n_photons * sim.geometry.cell_volume))
    for _ in range(cfg.nloop):
        key, subkey = jax.random.split(key)
        chi = (nd * xh * sigma_dx).reshape(-1)
        px, py, pz, dx_, dy, dz, tau, _, weight = sources.emit_point_source(
            subkey, cfg.n_photons, sim._source_gpos)
        packets = traversal.make_packets(
            jnp.stack([px, py, pz], 1), jnp.stack([dx_, dy, dz], 1),
            tau, weight, shape)
        tally = jnp.zeros(chi.shape, chi.dtype)
        tally = tracer(chi, packets, tally)
        jH = tally.reshape(shape) * jfac_scale
        xh = ionization.hydrogen_neutral_fraction(
            jH, nd, cfg.recombination_rate)
    return xh


def main():
    stages = [int(a) for a in sys.argv[1:]] or [4]
    sim, config = mod.build_simulation(small=False)
    geom = config.geometry
    shape = geom.shape
    block = traversal.default_block(shape)
    K = traversal.default_inner_steps(block)

    def plain(chi, packets, tally):
        t, _ = traversal.trace_packets_blocked(
            chi, packets, tally, shape=shape, block=block,
            periodic=geom.periodic, inner_steps=K)
        return t

    def cascade(shrink, n_stages):
        def f(chi, packets, tally):
            t, _, _ = traversal.trace_packets_blocked_cascade(
                chi, packets, tally, shape=shape, block=block,
                periodic=geom.periodic, inner_steps=K,
                shrink=shrink, n_stages=n_stages)
            return t
        return f

    variants = {
        "plain": plain,
        "cascade s4x3": cascade(4, 3),
        "cascade s3x4": cascade(3, 4),
        "cascade s2x6": cascade(2, 6),
        "cascade s8x2": cascade(8, 2),
    }

    done = 0
    for target in stages:
        t0 = time.time()
        sim.advance(target - done, log_every=1000)
        done = target
        sync(sim.neutral_fraction)
        print(f"--- at step {target} (advance took {time.time()-t0:.1f}s), "
              f"<xH>={float(jnp.mean(sim.neutral_fraction)):.4f}")
        nd = (hydro.primitives_from_conserved(sim.state, config.gamma).rho
              / constants.PROTON_MASS)
        key = jax.random.PRNGKey(7)
        for name, tracer in variants.items():
            fn = jax.jit(lambda k, n, x, tr=tracer: radiation_update(
                k, n, x, config, sim, tr))
            sync(fn(key, nd, sim.neutral_fraction))  # compile
            dt = timeit(lambda: sync(fn(key, nd, sim.neutral_fraction)))
            print(f"  {name:14s}: {dt:.3f}s /radiation-update "
                  f"({config.nloop} loops)")


if __name__ == "__main__":
    main()
