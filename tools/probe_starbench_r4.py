"""Round-4 probe: where does the 64^3 starbench step spend its time?

Runs the full-size starbench config a few steps in, then times each
component of the step separately on the real chip:
  - full fused step
  - radiation update (nloop loops)
  - a single trace call (and its phase count)
  - emission + packet build
  - hydro step alone

Usage: PYTHONPATH=/root/repo python tools/probe_starbench_r4.py [steps_in]
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


def main():
    steps_in = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sim, config = mod.build_simulation(small=False)
    geom = config.geometry
    shape = geom.shape
    print(f"shape={shape} n_photons={config.n_photons} nloop={config.nloop}")

    # advance a few steps so we're in the early-expansion regime the
    # reference was timed in
    t0 = time.time()
    sim.advance(steps_in, log_every=1000)
    sync(sim.neutral_fraction)
    print(f"warmup {steps_in} steps (incl compile): {time.time() - t0:.1f}s")

    # --- full step, per-step jit
    key = jax.random.PRNGKey(123)
    u, xh = sim.state, sim.neutral_fraction
    dtv = jnp.float32(config.timestep)
    step = jax.jit(sim._step, static_argnames=("do_radiation",))
    r = step(key, u, xh, dtv)
    sync(r[1])
    dt = timeit(lambda: sync(step(key, u, xh, dtv)[1]))
    print(f"full step: {dt:.3f}s")

    # --- radiation update alone (nloop={config.nloop})
    nd = hydro.primitives_from_conserved(u, config.gamma).rho / constants.PROTON_MASS
    rad = jax.jit(sim._radiation_update)
    sync(rad(key, nd, xh))
    dt = timeit(lambda: sync(rad(key, nd, xh)))
    print(f"radiation update ({config.nloop} loops): {dt:.3f}s")

    # --- single trace
    cfg = config
    sigma_dx = cfg.cross_section * sim.dx
    chi = (nd * xh * sigma_dx).reshape(-1)

    def one_loop(key):
        px, py, pz, dx_, dy, dz, tau, _, weight = sources.emit_point_source(
            key, cfg.n_photons, sim._source_gpos)
        packets = traversal.make_packets(
            jnp.stack([px, py, pz], 1), jnp.stack([dx_, dy, dz], 1),
            tau, weight, shape)
        tally = jnp.zeros(chi.shape, chi.dtype)
        tally, _ = traversal.trace_packets_auto(
            chi, packets, tally, shape=shape, periodic=geom.periodic)
        return tally

    one = jax.jit(one_loop)
    sync(one(key))
    dt = timeit(lambda: sync(one(key)))
    print(f"single emit+trace: {dt:.3f}s")

    # --- emission alone
    def emit(key):
        px, py, pz, dx_, dy, dz, tau, _, weight = sources.emit_point_source(
            key, cfg.n_photons, sim._source_gpos)
        packets = traversal.make_packets(
            jnp.stack([px, py, pz], 1), jnp.stack([dx_, dy, dz], 1),
            tau, weight, shape)
        return packets.px + packets.tau_left
    emitj = jax.jit(emit)
    sync(emitj(key))
    dt = timeit(lambda: sync(emitj(key)))
    print(f"emission alone: {dt:.3f}s")

    # --- phase count: live packets after k phases
    block = traversal.default_block(shape)
    K = traversal.default_inner_steps(block)
    px, py, pz, dx_, dy, dz, tau, _, weight = sources.emit_point_source(
        key, cfg.n_photons, sim._source_gpos)
    packets = traversal.make_packets(
        jnp.stack([px, py, pz], 1), jnp.stack([dx_, dy, dz], 1),
        tau, weight, shape)
    tally0 = jnp.zeros(chi.shape, chi.dtype)
    print(f"block={block} K={K}")
    for k in (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64):
        _, pk = traversal.trace_packets_blocked(
            chi, packets, tally0, shape=shape, block=block,
            periodic=geom.periodic, max_steps=k, inner_steps=K)
        live = int(jnp.sum(pk.active))
        print(f"  after {k:3d} phases: live={live}")
        if live == 0:
            break

    # --- hydro step alone
    hs = jax.jit(lambda u: hydro.hydro_step(
        u, jnp.float32(cfg.timestep), boundaries=cfg.boundaries,
        cell_size=(sim.dx,) * 3, gamma=cfg.gamma,
        riemann_solver=cfg.riemann_solver))
    r = hs(u)
    sync(r.rho)
    dt = timeit(lambda: sync(hs(u).rho))
    print(f"hydro step alone: {dt:.3f}s")

    # --- xh mean for context
    print(f"<xH> = {float(jnp.mean(xh)):.4f}, t = {sim.time:.3e} s")


if __name__ == "__main__":
    main()
