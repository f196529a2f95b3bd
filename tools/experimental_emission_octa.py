"""Stratified, octant-pure, spatially-coherent point-source emission.

The cone-marched traversal kernel (ops/cone_kernel.py) needs photon batches
whose consecutive lanes form *compact direction cones with uniform axis
signs*: each chunk of C lanes then stays inside one small grid slab for its
whole flight and the kernel never performs a per-lane HBM gather.

This module replaces the reference's independent isotropic sampling
(`PhotonSource::get_random_direction`,
/root/reference/src/PhotonSource.cpp:189-256 — one uniform (cosθ, φ) pair
per photon) with an **equal-area stratified** direction set:

* the sphere is split into 8 octants; each octant is parameterized by the
  triangle {a,b ≥ 0, a+b ≤ 1} through the equal-area octahedral map
  (ρ = a+b, f = b/ρ, z = 1-ρ², sinθ = ρ·√(2-ρ²), φ = (π/2)·f — the
  Jacobian is constant, so equal parameter area = equal solid angle);
* each octant's triangle is stratified by a rectangular grid on [0,1]²
  folded area-preservingly onto the triangle ((a,b) → (1-b,1-a) for
  a+b > 1; the triangle is covered exactly twice, so a uniform grid on the
  square is a valid 2× stratification of the triangle);
* lanes are ordered by Morton index of the *folded* cell centre, so any
  run of consecutive lanes is a compact direction patch;
* per-iteration jitter inside each cell keeps the estimator unbiased: the
  expectation over the jitter equals the isotropic integral exactly, with
  variance ≤ the iid sampler's (stratification never increases variance).

All direction signs within an octant are constant by construction, so any
chunk that does not cross an octant boundary in lane space is sign-pure;
octant boundaries are aligned to multiples of n/8 lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_TABLE_CACHE = {}


def _morton2(ix, iy):
    """Interleave bits of (ix, iy) -> Morton code (numpy, any width)."""
    code = np.zeros_like(ix, dtype=np.int64)
    for b in range(21):
        code |= ((ix >> b) & 1) << (2 * b)
        code |= ((iy >> b) & 1) << (2 * b + 1)
    return code


def lane_table(n: int):
    """Static per-lane stratification table for ``n`` photons.

    n must be divisible by 8 with n/8 = ga*gb for a 2:1 grid (ga = 2*gb).
    Returns int32 arrays (octant[n], cell_a[n], cell_b[n]) plus the grid
    dims (ga, gb). Lanes are contiguous per octant and Morton-ordered by
    folded cell centre inside each octant.
    """
    key = n
    if key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    if n % 8:
        raise ValueError("n must be divisible by 8")
    per_oct = n // 8
    gb = int(np.sqrt(per_oct / 2))
    ga = 2 * gb
    if ga * gb != per_oct:
        raise ValueError(
            f"n/8 = {per_oct} is not 2*k^2 for integer k (n={n})")
    ia, ib = np.meshgrid(np.arange(ga), np.arange(gb), indexing="ij")
    ia, ib = ia.ravel(), ib.ravel()
    # folded cell centre (for ordering only)
    ca = (ia + 0.5) / ga
    cb = (ib + 0.5) / gb
    over = ca + cb > 1.0
    fa = np.where(over, 1.0 - cb, ca)
    fb = np.where(over, 1.0 - ca, cb)
    # Morton order on the folded centre quantized to the finer grid axis
    q = max(ga, gb)
    code = _morton2((fa * q).astype(np.int64), (fb * q).astype(np.int64))
    order = np.argsort(code, kind="stable")
    ia, ib = ia[order], ib[order]
    octant = np.repeat(np.arange(8, dtype=np.int32), per_oct)
    cell_a = np.tile(ia.astype(np.int32), 8)
    cell_b = np.tile(ib.astype(np.int32), 8)
    out = (jnp.asarray(octant), jnp.asarray(cell_a), jnp.asarray(cell_b),
           ga, gb)
    _TABLE_CACHE[key] = out
    return out


#: sign triplets per octant index (x, y, z)
_OCT_SIGNS = np.array(
    [[sx, sy, sz]
     for sz in (1.0, -1.0) for sy in (1.0, -1.0) for sx in (1.0, -1.0)],
    dtype=np.float32,
)


@functools.partial(jax.jit, static_argnames=("n",))
def stratified_directions(key, n: int):
    """[n,3] unit directions: equal-area stratified, Morton/octant ordered.

    Every lane's direction-sign triplet equals _OCT_SIGNS[lane // (n//8)].
    """
    octant, cell_a, cell_b, ga, gb = lane_table(n)
    k1, k2 = jax.random.split(key)
    ja = jax.random.uniform(k1, (n,), jnp.float32)
    jb = jax.random.uniform(k2, (n,), jnp.float32)
    a = (cell_a.astype(jnp.float32) + ja) / ga
    b = (cell_b.astype(jnp.float32) + jb) / gb
    # fold the square onto the triangle a+b <= 1 (area-preserving 2-cover)
    over = a + b > 1.0
    a, b = jnp.where(over, 1.0 - b, a), jnp.where(over, 1.0 - a, b)
    rho = jnp.maximum(a + b, 1e-12)
    f = b / rho
    z = 1.0 - rho * rho
    sin_t = rho * jnp.sqrt(jnp.maximum(2.0 - rho * rho, 0.0))
    phi = (0.5 * np.pi) * f
    x = sin_t * jnp.cos(phi)
    y = sin_t * jnp.sin(phi)
    signs = jnp.asarray(_OCT_SIGNS)[octant]
    d = jnp.stack([x, y, z], axis=1) * signs
    # exact normalization (the map is unit-norm up to round-off)
    return d / jnp.linalg.norm(d, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("n",))
def emit_point_source_stratified(key, n: int, source_gpos):
    """Stratified point-source emission (grid units).

    Returns (position [n,3], direction [n,3], tau [n], weight [n]).
    Statistically equivalent to `sources.emit_point_source` (same isotropic
    expectation; τ = -ln ξ iid as in the reference,
    IonizationPhotonShootJob.hpp) but with coherent lane ordering.
    """
    kd, kt = jax.random.split(key)
    d = stratified_directions(kd, n)
    pos = jnp.broadcast_to(
        jnp.asarray(source_gpos, jnp.float32), (n, 3))
    u = jax.random.uniform(kt, (n,), jnp.float32, 1e-10, 1.0)
    tau = -jnp.log(u)
    w = jnp.ones((n,), jnp.float32)
    return pos, d, tau, w
