"""Decompose the traversal body cost, defeating the axon relay cache by
varying inputs every call (add a per-call offset to positions/values)."""

import time

import jax
import jax.numpy as jnp

P = 1 << 20
NX = NY = NZ = 64
N_CELL = NX * NY * NZ
STEPS = 32
_EPS_DIR = 1e-12


def timed_vary(make_args, fn, n=5, warmup=1):
    for i in range(warmup):
        out = fn(*make_args(1000 + i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*make_args(i))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def _wall_distance(pos, cell, dirn):
    positive = dirn > 0.0
    wall = (cell + positive.astype(jnp.int32)).astype(pos.dtype)
    safe = jnp.where(jnp.abs(dirn) > _EPS_DIR, dirn, _EPS_DIR)
    t = (wall - pos) / safe
    return jnp.where(jnp.abs(dirn) > _EPS_DIR, jnp.maximum(t, 0.0), jnp.inf)


def make_loop(gather=True, scatter=True, advance=True, walls=True):
    @jax.jit
    def run(px, py, pz, dx, dy, dz, cx, cy, cz, tau, w, active, chi, tally):
        def body(i, c):
            px, py, pz, cx, cy, cz, tau, active, tly = c
            if walls:
                tx = _wall_distance(px, cx, dx)
                ty = _wall_distance(py, cy, dy)
                tz = _wall_distance(pz, cz, dz)
                l_exit = jnp.minimum(tx, jnp.minimum(ty, tz))
            else:
                l_exit = jnp.full_like(px, 0.5)
                tx = ty = l_exit

            flat = (cx * NY + cy) * NZ + cz
            if gather:
                chi_p = jnp.maximum(chi[flat], 1e-30)
            else:
                chi_p = jnp.full_like(px, 0.3)
            tau_cell = chi_p * l_exit
            absorbed_now = active & (tau_cell >= tau)
            l_travel = jnp.where(absorbed_now, tau / chi_p, l_exit)

            if scatter:
                deposit = jnp.where(active, l_travel * w, 0.0)
                tly = tly.at[flat].add(deposit, mode="drop")

            if advance:
                npx = px + dx * l_travel
                npy = py + dy * l_travel
                npz = pz + dz * l_travel
                cross_x = active & ~absorbed_now & (l_exit == tx)
                cross_y = active & ~absorbed_now & ~cross_x & (l_exit == ty)
                cross_z = active & ~absorbed_now & ~cross_x & ~cross_y
                step_x = jnp.where(dx > 0, 1, -1).astype(jnp.int32)
                step_y = jnp.where(dy > 0, 1, -1).astype(jnp.int32)
                step_z = jnp.where(dz > 0, 1, -1).astype(jnp.int32)
                ncx = cx + jnp.where(cross_x, step_x, 0)
                ncy = cy + jnp.where(cross_y, step_y, 0)
                ncz = cz + jnp.where(cross_z, step_z, 0)
                npx = jnp.where(cross_x, jnp.where(dx > 0, cx + 1, cx).astype(px.dtype), npx)
                npy = jnp.where(cross_y, jnp.where(dy > 0, cy + 1, cy).astype(py.dtype), npy)
                npz = jnp.where(cross_z, jnp.where(dz > 0, cz + 1, cz).astype(pz.dtype), npz)
                inside = (ncx >= 0) & (ncx < NX) & (ncy >= 0) & (ncy < NY) & (ncz >= 0) & (ncz < NZ)
                ntau = jnp.where(absorbed_now, 0.0, tau - tau_cell)
                nactive = active & ~absorbed_now & inside
                upd = active
                px2 = jnp.where(upd, npx, px)
                py2 = jnp.where(upd, npy, py)
                pz2 = jnp.where(upd, npz, pz)
                cx2 = jnp.where(upd, ncx, cx)
                cy2 = jnp.where(upd, ncy, cy)
                cz2 = jnp.where(upd, ncz, cz)
                tau2 = jnp.where(upd, ntau, tau)
                return px2, py2, pz2, cx2, cy2, cz2, tau2, nactive, tly
            else:
                ncx = (cx + 1) % NX
                return px, py, pz, ncx, cy, cz, tau, active, tly

        out = jax.lax.fori_loop(
            0, STEPS, body, (px, py, pz, cx, cy, cz, tau, active, tally)
        )
        return out[-1], out[6]

    return run


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    base = dict(
        dx=jax.random.normal(ks[3], (P,), jnp.float32),
        dy=jax.random.normal(ks[4], (P,), jnp.float32),
        dz=jax.random.normal(ks[5], (P,), jnp.float32),
        w=jnp.ones((P,), jnp.float32),
        active=jnp.ones((P,), bool),
        chi=jax.random.uniform(ks[6], (N_CELL,), jnp.float32),
        tally=jnp.zeros((N_CELL,), jnp.float32),
    )
    norm = jnp.sqrt(base["dx"] ** 2 + base["dy"] ** 2 + base["dz"] ** 2)
    base["dx"] /= norm
    base["dy"] /= norm
    base["dz"] /= norm

    def make_args(seed):
        k = jax.random.PRNGKey(seed)
        kk = jax.random.split(k, 4)
        px = jax.random.uniform(kk[0], (P,), jnp.float32) * NX
        py = jax.random.uniform(kk[1], (P,), jnp.float32) * NY
        pz = jax.random.uniform(kk[2], (P,), jnp.float32) * NZ
        tau = -jnp.log(jax.random.uniform(kk[3], (P,), minval=1e-9))
        cx = jnp.clip(px.astype(jnp.int32), 0, NX - 1)
        cy = jnp.clip(py.astype(jnp.int32), 0, NY - 1)
        cz = jnp.clip(pz.astype(jnp.int32), 0, NZ - 1)
        return (
            px, py, pz, base["dx"], base["dy"], base["dz"],
            cx, cy, cz, tau.astype(jnp.float32), base["w"], base["active"],
            base["chi"], base["tally"],
        )

    variants = [
        ("walls only", make_loop(gather=False, scatter=False, advance=False)),
        ("walls+gather", make_loop(gather=True, scatter=False, advance=False)),
        ("walls+scatter", make_loop(gather=False, scatter=True, advance=False)),
        ("walls+gather+scatter", make_loop(gather=True, scatter=True, advance=False)),
        ("full body", make_loop(gather=True, scatter=True, advance=True)),
        ("full minus scatter", make_loop(gather=True, scatter=False, advance=True)),
        ("full minus gather", make_loop(gather=False, scatter=True, advance=True)),
    ]
    for name, fn in variants:
        dt = timed_vary(make_args, fn)
        print(f"{name:24s} {dt*1e3:9.2f} ms total  {dt/STEPS*1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
