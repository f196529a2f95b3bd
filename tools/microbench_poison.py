"""Which part of h_only_iteration degrades the process? Run variants, then
re-measure the fast synthetic traversal.

Usage: python microbench_poison.py {noop|iter|iter_nodonate|emit|chi}
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from cmacionize_tpu.ops import traversal
from cmacionize_tpu.models import sources
from cmacionize_tpu.ops import ionization

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


def measure(tag):
    d = timed_vary(lambda s: (chi_synth, pk_synth(s)),
                   lambda c, p: traversal.trace_packets(c, p, tly, shape=SHAPE))
    print(f"[{tag}] synth traversal: {d*1e3:9.1f} ms", flush=True)


mode = sys.argv[1] if len(sys.argv) > 1 else "noop"
measure("before")

nd_field = jnp.full(SHAPE, 1e8, jnp.float32)
xh_field = jnp.full(SHAPE, 1e-6, jnp.float32)
key = jax.random.PRNGKey(0)
kwargs = dict(
    shape=SHAPE, periodic=(False, False, False), n_photons=P,
    sigma_dx=6.3e-22 * 4.8e15, source_gpos=(32.0, 32.0, 32.0),
    jfac_scale=1e-10, alpha=4e-19,
)

if mode == "iter":
    from cmacionize_tpu.models.ionization_simulation import h_only_iteration
    out = h_only_iteration(key, xh_field, nd_field, **kwargs)
    jax.block_until_ready(out)
    xh_field = out[0]
elif mode == "iter_nodonate":
    import functools

    @functools.partial(
        jax.jit,
        static_argnames=("shape", "periodic", "n_photons", "sigma_dx"),
    )
    def iter_nd(key, neutral_fraction, number_density, *, shape, periodic,
                n_photons, sigma_dx, source_gpos, jfac_scale, alpha):
        chi = (number_density * neutral_fraction * sigma_dx).reshape(-1)
        px, py, pz, dx, dy, dz, tau, _, weight = sources.emit_point_source(
            key, n_photons, source_gpos
        )
        packets = traversal.make_packets(
            jnp.stack([px, py, pz], 1), jnp.stack([dx, dy, dz], 1),
            tau, weight, shape,
        )
        tally = jnp.zeros(chi.shape, chi.dtype)
        tally, packets = traversal.trace_packets(
            chi, packets, tally, shape=shape, periodic=periodic
        )
        jH = tally.reshape(shape) * jfac_scale
        new_x = ionization.hydrogen_neutral_fraction(jH, number_density, alpha)
        return new_x, jH, jnp.sum(~packets.absorbed)

    out = iter_nd(key, xh_field, nd_field, **kwargs)
    jax.block_until_ready(out)
elif mode == "emit":
    emitfn = jax.jit(lambda k: sources.emit_point_source(k, P, (32.0, 32.0, 32.0)))
    out = emitfn(key)
    jax.block_until_ready(out)
elif mode == "chi":
    f = jax.jit(lambda n, x: (n * x * 3.0).reshape(-1))
    out = f(nd_field, xh_field)
    jax.block_until_ready(out)

measure("after " + mode)
