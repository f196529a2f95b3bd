"""Moving-mesh finite-volume hydrodynamics on the Voronoi grid.

Equivalent of the reference's Voronoi hydro mode — VoronoiDensityGrid's
`set_grid_velocity`/`evolve` moving-mesh support
(/root/reference/src/VoronoiDensityGrid.hpp:87-88, .cpp:205-290) plugged
into the HydroIntegrator — redesigned for the TPU split used throughout the
Voronoi family: *re-tessellation on the host* (scipy Qhull, like the
reference's grid construction), *flux computation on device* over the padded
cell-graph arrays.

Scheme (MUSCL Godunov, moving faces):

* state is INTENSIVE per cell (densities of mass/momentum/energy): SI cell
  volumes of astrophysical problems (~1e47 m³) overflow f32, so extensive
  totals cannot live on device; the geometric factors A_face/V_cell are
  precomputed host-side in f64 (they are O(1/cell-size), comfortably f32)
  and the flux update is dU_i = -dt Σ_k (A_ik/V_i) F_ik.  After a mesh
  evolve, totals conservation is restored by rescaling with V_old/V_new
  (:func:`remap_after_evolve`);
* per face: the HLLC flux is solved in the face frame (normal velocities
  shifted by the face speed w_n = ½(v_i + v_j)·n̂) and de-boosted back,
  F = F' + w_n·(0, m', …, F'_un + ½w_n m') — the Galilean transform the
  reference applies at HLLCRiemannSolver.hpp:309-313;
* wall faces use the mirror state (reflective boundary);
* `evolve` drifts the generators with the grid velocity and re-tessellates;
  primitives are re-derived from the unchanged totals and the new volumes.

Second order (VERDICT r3 ask #10): least-squares cell gradients over the
neighbor graph (evaluated at TRUE face polygon centroids — bisector
midpoints sit off the face on irregular meshes) + Barth-Jespersen limiting
with a 0.5 slope safety factor + per-face pair clamping + half-dt
primitive prediction (the reference's GradientCalculator / Hydro::limit /
predict_primitive_variables machinery re-derived for the flattened
cell-graph arrays), plus a face-symmetric first-order fallback on cells a
trial update would drain.  Default ON everywhere, including the RHD
driver (the full-slope instability on near-vacuum D-type interiors is
cured by the centroid arms + slope factor; probed in round 4).

Documented deltas vs the reference: per-row flux evaluation (each face
computed from both sides; HLLC's L/R symmetry makes the two values equal
to f32 round-off rather than bit-exactly shared).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cmacionize_tpu.models.voronoi import VoronoiGrid, _tessellate
from cmacionize_tpu.ops import riemann


class VoronoiHydroState(NamedTuple):
    """Intensive conserved state per cell (SI densities: kg/m³, kg/(m²s),
    J/m³) — see the module docstring for why totals are not stored."""

    rho: jnp.ndarray
    mom_x: jnp.ndarray
    mom_y: jnp.ndarray
    mom_z: jnp.ndarray
    energy: jnp.ndarray


def conserved_from_primitives(rho, vx, vy, vz, p, volumes, gamma):
    """``volumes`` is accepted for API symmetry but unused (intensive)."""
    del volumes
    return VoronoiHydroState(
        rho=rho,
        mom_x=rho * vx,
        mom_y=rho * vy,
        mom_z=rho * vz,
        energy=p / (gamma - 1.0) + 0.5 * rho * (vx**2 + vy**2 + vz**2),
    )


def primitives_from_conserved(state: VoronoiHydroState, volumes, gamma):
    """``volumes`` accepted for API symmetry but unused (intensive)."""
    del volumes
    rho = state.rho
    inv_rho = 1.0 / jnp.maximum(rho, 1e-300)
    vx = state.mom_x * inv_rho
    vy = state.mom_y * inv_rho
    vz = state.mom_z * inv_rho
    ekin = 0.5 * (state.mom_x * vx + state.mom_y * vy + state.mom_z * vz)
    p = jnp.maximum((state.energy - ekin) * (gamma - 1.0), 1e-30)
    return rho, vx, vy, vz, p


def total_mass(state: VoronoiHydroState, volumes) -> float:
    """Σ ρ_i V_i in f64 on the host (volumes overflow f32 on device)."""
    return float(
        (np.asarray(state.rho, np.float64) * np.asarray(volumes, np.float64))
        .sum()
    )


def remap_after_evolve(state: VoronoiHydroState, old_volumes, new_volumes):
    """Restore totals conservation after a mesh evolve: each cell's totals
    ride with its generator, so densities rescale by V_old/V_new."""
    ratio = jnp.asarray(
        np.asarray(old_volumes, np.float64) / np.asarray(new_volumes,
                                                         np.float64),
        jnp.float32)
    return VoronoiHydroState(*(f * ratio for f in state))


def _lsq_gradients(W, rel_pos, is_cell, dW):
    """Weighted least-squares cell gradients over the neighbor graph.

    The unstructured-mesh counterpart of the reference's gradient sweeps +
    cell slope limiter (GradientCalculator.hpp,
    HydroDensitySubGrid.hpp:568-626): G = Σ w dd^T, b = Σ w d ΔW,
    ∇W = G⁻¹ b with w = 1/|d|².  ``rel_pos`` [C,K,3] neighbor − cell
    generator offsets (meters, masked by is_cell); ``dW`` [C,K] value
    jumps.  Returns [C,3].
    """
    w = jnp.where(
        is_cell,
        1.0 / jnp.maximum(jnp.sum(rel_pos * rel_pos, -1), 1e-30),
        0.0,
    )
    G = jnp.einsum("ck,cka,ckb->cab", w, rel_pos, rel_pos)
    # Tikhonov floor keeps degenerate stencils (boundary cells with < 3
    # independent directions) finite; their gradients limit toward zero
    tr = jnp.trace(G, axis1=1, axis2=2)[:, None, None]
    G = G + 1e-8 * jnp.maximum(tr, 1e-30) * jnp.eye(3)[None]
    b = jnp.einsum("ck,cka->ca", w * jnp.where(is_cell, dW, 0.0), rel_pos)
    return jnp.linalg.solve(G, b[..., None])[..., 0]


@functools.partial(
    jax.jit, static_argnames=("gamma", "second_order", "slope_factor"))
def _voronoi_flux_update(
    neighbors, normals, area_over_vol, face_rel, nbr_rel, state, gen_vel,
    dt, gamma, second_order: bool = True, slope_factor: float = 0.5,
):
    """One moving-face Godunov update of the intensive state.

    ``area_over_vol``: [C, K] f32 — A_face / V_cell (1/m), precomputed in
    f64 on the host (SI areas/volumes individually overflow f32).
    ``face_rel``: [C, K, 3] f32 — face point − cell generator (meters),
    the reconstruction arm of the second-order scheme.

    ``second_order``: MUSCL reconstruction on the cell graph —
    least-squares gradients + Barth-Jespersen cell limiter + per-face
    pair clamping + half-dt primitive prediction, the unstructured
    counterpart of the reference's full second-order machinery
    (GradientCalculator.hpp, Hydro.hpp:108 ``limit``,
    ``predict_primitive_variables``); False mirrors NO_SECOND_ORDER.
    """
    rho, vx, vy, vz, p = primitives_from_conserved(state, None, gamma)

    nbr = neighbors  # [C, K]
    safe_nbr = jnp.maximum(nbr, 0)
    is_cell = nbr >= 0
    is_wall = nbr == -1

    def gather(f):
        return f[safe_nbr]  # [C, K]

    # face basis: n̂ plus two tangents
    n = normals  # [C, K, 3]
    t1 = jnp.stack([-n[..., 1], n[..., 0], jnp.zeros_like(n[..., 0])], -1)
    degen = jnp.linalg.norm(t1, axis=-1, keepdims=True) < 1e-6
    t1 = jnp.where(
        degen,
        jnp.stack([jnp.zeros_like(n[..., 0]), -n[..., 2], n[..., 1]], -1),
        t1,
    )
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-30)
    t2 = jnp.cross(n, t1)

    def project(fx, fy, fz):
        v = jnp.stack([fx, fy, fz], -1)
        return (
            jnp.einsum("ckd,ckd->ck", v, n),
            jnp.einsum("ckd,ckd->ck", v, t1),
            jnp.einsum("ckd,ckd->ck", v, t2),
        )

    ones = jnp.ones_like(area_over_vol)
    if second_order:
        rel = nbr_rel  # neighbor generator offsets (LSQ stencil arms)
        tinyW = 1e-12

        def limited_gradient(W):
            dW = gather(W) - W[:, None]
            g = _lsq_gradients(W, rel, is_cell, dW)
            ext = jnp.einsum("cka,ca->ck", face_rel, g)
            nbrW = jnp.where(is_cell, gather(W), W[:, None])
            Wmax = jnp.maximum(jnp.max(nbrW, 1), W)
            Wmin = jnp.minimum(jnp.min(nbrW, 1), W)
            hi = (Wmax - W)[:, None]
            lo = (Wmin - W)[:, None]
            a = jnp.where(
                ext > tinyW, hi / jnp.maximum(ext, tinyW),
                jnp.where(ext < -tinyW, lo / jnp.minimum(ext, -tinyW), 1.0),
            )
            a = jnp.where(is_cell | is_wall, a, 1.0)
            # slope_factor < 1 damps the limited gradients: full
            # Barth-Jespersen slopes are marginally unstable on irregular
            # Qhull meshes at strong contrasts (round-4 hot-bubble probes:
            # full slopes blow up by step ~70, 0.5 survives, 0.25 is as
            # robust as first order) — the safety-factor practice of
            # unstructured FV codes
            alpha = slope_factor * jnp.clip(jnp.min(a, axis=1), 0.0, 1.0)
            return g * alpha[:, None]

        gr_rho = limited_gradient(rho)
        gr_vx = limited_gradient(vx)
        gr_vy = limited_gradient(vy)
        gr_vz = limited_gradient(vz)
        gr_p = limited_gradient(p)

        # half-dt primitive prediction (predict_primitive_variables)
        half = 0.5 * dt
        div_v = gr_vx[:, 0] + gr_vy[:, 1] + gr_vz[:, 2]
        inv_rho_c = 1.0 / jnp.maximum(rho, 1e-300)

        def vdot(g):
            return vx * g[:, 0] + vy * g[:, 1] + vz * g[:, 2]

        rho_p = rho - half * (vdot(gr_rho) + rho * div_v)
        vx_p = vx - half * (vdot(gr_vx) + gr_p[:, 0] * inv_rho_c)
        vy_p = vy - half * (vdot(gr_vy) + gr_p[:, 1] * inv_rho_c)
        vz_p = vz - half * (vdot(gr_vz) + gr_p[:, 2] * inv_rho_c)
        p_p = p - half * (vdot(gr_p) + gamma * p * div_v)
        # positivity: fall back to the unpredicted value (SAFE_HYDRO)
        rho_p = jnp.where(rho_p > 0.0, rho_p, rho)
        p_p = jnp.where(p_p > 0.0, p_p, p)

        def face_L(Wp, g):
            return Wp[:, None] + jnp.einsum("cka,ca->ck", face_rel, g)

        def face_R(Wp, g):
            # the neighbor's arm to the shared face point: fp − g_j
            arm_j = face_rel - nbr_rel
            return gather(Wp) + jnp.einsum(
                "cka,cka->ck", arm_j, gather(g))

        def pair_clamp(L, R, Wi, Wj):
            # per-face pair limiting (Hydro.hpp:108 ``limit``): face values
            # stay within the envelope of the two cell values
            lo = jnp.minimum(Wi[:, None], Wj)
            hi = jnp.maximum(Wi[:, None], Wj)
            return jnp.clip(L, lo, hi), jnp.clip(R, lo, hi)

        rhoL, rhoR_c = pair_clamp(
            face_L(rho_p, gr_rho), face_R(rho_p, gr_rho), rho, gather(rho))
        pL, pR_c = pair_clamp(
            face_L(p_p, gr_p), face_R(p_p, gr_p), p, gather(p))
        vxL, vxR = pair_clamp(
            face_L(vx_p, gr_vx), face_R(vx_p, gr_vx), vx, gather(vx))
        vyL, vyR = pair_clamp(
            face_L(vy_p, gr_vy), face_R(vy_p, gr_vy), vy, gather(vy))
        vzL, vzR = pair_clamp(
            face_L(vz_p, gr_vz), face_R(vz_p, gr_vz), vz, gather(vz))
        rhoL2 = jnp.maximum(rhoL, 1e-30)
        pL2 = jnp.maximum(pL, 1e-30)
        uL2, ut1L2, ut2L2 = project(vxL, vyL, vzL)
        rhoR2 = jnp.where(is_cell, jnp.maximum(rhoR_c, 1e-30), rhoL2)
        pR2 = jnp.where(is_cell, jnp.maximum(pR_c, 1e-30), pL2)
        uRn, ut1R2, ut2R2 = project(vxR, vyR, vzR)
        uR2 = jnp.where(is_cell, uRn, -uL2)
        ut1R2 = jnp.where(is_cell, ut1R2, ut1L2)
        ut2R2 = jnp.where(is_cell, ut2R2, ut2L2)

    # first-order left/right states (also the per-cell fallback below)
    rhoL1 = rho[:, None] * ones
    pL1 = p[:, None] * ones
    uL1, ut1L1, ut2L1 = project(
        vx[:, None] * ones, vy[:, None] * ones, vz[:, None] * ones)
    # right (neighbor) state; wall → mirror (flip normal velocity)
    rhoR1 = jnp.where(is_cell, gather(rho), rhoL1)
    pR1 = jnp.where(is_cell, gather(p), pL1)
    uRn1, ut1R1, ut2R1 = project(gather(vx), gather(vy), gather(vz))
    uR1 = jnp.where(is_cell, uRn1, -uL1)
    ut1R1 = jnp.where(is_cell, ut1R1, ut1L1)
    ut2R1 = jnp.where(is_cell, ut2R1, ut2L1)

    # face speed along the normal (moving mesh); walls don't move
    gvn, _, _ = project(
        gen_vel[:, 0][:, None] * jnp.ones_like(area_over_vol),
        gen_vel[:, 1][:, None] * jnp.ones_like(area_over_vol),
        gen_vel[:, 2][:, None] * jnp.ones_like(area_over_vol),
    )
    gvn_nbr, _, _ = project(
        gather(gen_vel[:, 0]), gather(gen_vel[:, 1]), gather(gen_vel[:, 2])
    )
    w_n = jnp.where(is_cell, 0.5 * (gvn + gvn_nbr), 0.0)

    def deltas(rhoL, uL, ut1L, ut2L, pL, rhoR, uR, ut1R, ut2R, pR):
        flux = riemann.hllc_flux(
            rhoL, uL - w_n, ut1L, ut2L, pL,
            rhoR, uR - w_n, ut1R, ut2R, pR,
            gamma=gamma,
        )
        f_rho, f_un, f_ut1, f_ut2, f_e = (
            flux.mass, flux.mom_n, flux.mom_t1, flux.mom_t2, flux.energy)
        # de-boost to the lab frame
        f_e = f_e + w_n * (f_un + 0.5 * w_n * f_rho)
        f_un = f_un + w_n * f_rho
        # rotate momentum flux back to xyz
        fm = (
            f_un[..., None] * n + f_ut1[..., None] * t1
            + f_ut2[..., None] * t2
        )
        active = (is_cell | is_wall).astype(f_rho.dtype)
        wA = area_over_vol * active * dt
        return (
            -jnp.sum(f_rho * wA, axis=1),
            -jnp.sum(fm * wA[..., None], axis=1),
            -jnp.sum(f_e * wA, axis=1),
        )

    if second_order:
        # trial second-order update → flag cells it would strongly drain
        # (the rarefying D-type interior approaches vacuum, where the
        # sharper reconstruction loses positivity); then recompute with
        # FIRST-order states on every face touching a flagged cell.  The
        # flag is symmetric across each face (flag_i | flag_j), so both
        # sides see the same face states and conservation is untouched —
        # the unstructured analog of SAFE_HYDRO's troubled-cell handling.
        d2 = deltas(rhoL2, uL2, ut1L2, ut2L2, pL2,
                    rhoR2, uR2, ut1R2, ut2R2, pR2)
        rho2 = state.rho + d2[0]
        e2 = state.energy + d2[2]
        flag = (
            (rho2 < 0.25 * state.rho) | (e2 < 0.25 * state.energy)
            | ~jnp.isfinite(rho2) | ~jnp.isfinite(e2)
        )
        bad_face = flag[:, None] | jnp.where(is_cell, flag[safe_nbr], False)

        def pick(a1, a2):
            return jnp.where(bad_face, a1, a2)

        d_rho, d_mom, d_energy = deltas(
            pick(rhoL1, rhoL2), pick(uL1, uL2), pick(ut1L1, ut1L2),
            pick(ut2L1, ut2L2), pick(pL1, pL2),
            pick(rhoR1, rhoR2), pick(uR1, uR2), pick(ut1R1, ut1R2),
            pick(ut2R1, ut2R2), pick(pR1, pR2),
        )
    else:
        d_rho, d_mom, d_energy = deltas(
            rhoL1, uL1, ut1L1, ut2L1, pL1,
            rhoR1, uR1, ut1R1, ut2R1, pR1)
    return VoronoiHydroState(
        rho=state.rho + d_rho,
        mom_x=state.mom_x + d_mom[:, 0],
        mom_y=state.mom_y + d_mom[:, 1],
        mom_z=state.mom_z + d_mom[:, 2],
        energy=state.energy + d_energy,
    )


def neighbor_offsets(grid: VoronoiGrid) -> np.ndarray:
    """[C, K, 3] f32 apparent neighbor generator − cell generator (meters);
    zero on wall/padding faces."""
    g = np.asarray(grid.generators, np.float64)
    nbr = grid.neighbors
    safe = np.maximum(nbr, 0)
    rel = g[safe] - g[:, None, :]
    if grid.shifts is not None:
        # crossing shifts map into the true neighbor frame (pos += shift),
        # so the APPARENT neighbor position is g_true − shift
        rel = rel - np.asarray(grid.shifts, np.float64)
    rel = np.where((nbr >= 0)[..., None], rel, 0.0)
    return (rel * grid.scale).astype(np.float32)


def face_arms(grid: VoronoiGrid) -> np.ndarray:
    """[C, K, 3] f32 face point − cell generator (meters).

    Uses the TRUE face polygon centroid when the grid carries it (on
    irregular meshes the perpendicular-bisector midpoint can sit far off
    the actual face — the round-4 hot-bubble probes traced the
    second-order instability to exactly this inconsistency); falls back to
    the bisector midpoint for cell faces and the generator's wall
    projection for wall faces.
    """
    g = np.asarray(grid.generators, np.float64)
    nbr = grid.neighbors
    rel = neighbor_offsets(grid).astype(np.float64) / grid.scale
    n = np.asarray(grid.normals, np.float64)
    dist = np.asarray(grid.offsets, np.float64) - np.einsum(
        "cka,ca->ck", n, g)
    wall_arm = dist[..., None] * n
    arm = np.where((nbr >= 0)[..., None], 0.5 * rel, wall_arm)
    if grid.face_centroids is not None:
        fc_arm = np.asarray(grid.face_centroids, np.float64) - g[:, None, :]
        arm = np.where((nbr != -2)[..., None], fc_arm, arm)
    arm = np.where((nbr != -2)[..., None], arm, 0.0)
    return (arm * grid.scale).astype(np.float32)


def voronoi_hydro_step(
    grid: VoronoiGrid,
    state: VoronoiHydroState,
    gen_velocities_si,  # [C, 3] m/s — the grid velocity (set_grid_velocity)
    dt: float,
    gamma: float = 5.0 / 3.0,
    second_order: bool = True,
    slope_factor: float = 0.5,
) -> VoronoiHydroState:
    """Advance the intensive state one step on the (possibly moving) mesh."""
    area_over_vol = jnp.asarray(
        np.asarray(grid.areas, np.float64) * grid.scale**2
        / np.asarray(grid.volumes, np.float64)[:, None],
        jnp.float32)
    return _voronoi_flux_update(
        jnp.asarray(grid.neighbors),
        jnp.asarray(grid.normals),
        area_over_vol,
        jnp.asarray(face_arms(grid)),
        jnp.asarray(neighbor_offsets(grid)),
        state,
        jnp.asarray(gen_velocities_si, jnp.float32),
        jnp.float32(dt),
        gamma,
        second_order,
        slope_factor,
    )


def evolve_voronoi_grid(
    grid: VoronoiGrid, gen_velocities_si, dt: float
) -> VoronoiGrid:
    """Drift the generators with the grid velocity and re-tessellate.

    The VoronoiDensityGrid::evolve equivalent
    (/root/reference/src/VoronoiDensityGrid.cpp:205-290): generators move,
    the mesh is rebuilt, cell totals ride along with their generator.
    Non-periodic axes clamp generators inside the box (the reference keeps
    them in the box the same way); periodic axes wrap.
    """
    sides = np.asarray(grid.geometry.sides, np.float64)
    box = sides / grid.scale
    pts = grid.generators + np.asarray(gen_velocities_si) * dt / grid.scale
    eps = 1e-6
    for axis in range(3):
        if grid.geometry.periodic[axis]:
            pts[:, axis] = np.mod(pts[:, axis], box[axis])
        else:
            pts[:, axis] = np.clip(
                pts[:, axis], eps * box[axis], (1.0 - eps) * box[axis])
    margin = None
    if len(pts) > 4000:
        margin = min(0.45, 8.0 * len(pts) ** (-1.0 / 3.0))
    try:
        return _tessellate(grid.geometry, pts, box, grid.scale, margin=margin)
    except AssertionError:
        return _tessellate(grid.geometry, pts, box, grid.scale)


def grid_velocity_from_fluid(
    grid: VoronoiGrid, state: VoronoiHydroState, gamma: float,
    damp: float = 1.0,
) -> np.ndarray:
    """set_grid_velocity: generators follow the local fluid velocity
    (cf. VoronoiDensityGrid::set_grid_velocity — the reference sets the
    generator velocity to the cell's fluid velocity)."""
    _, vx, vy, vz, _ = primitives_from_conserved(
        state, jnp.asarray(grid.volumes, jnp.float32), gamma)
    return damp * np.stack(
        [np.asarray(vx), np.asarray(vy), np.asarray(vz)], axis=1)


# ---------------------------------------------------------------------------
# Coupled RHD on the Voronoi grid (the starbench_voronoi benchmark class,
# /root/reference/benchmarks/starbench_voronoi.param)
# ---------------------------------------------------------------------------


class VoronoiRHDSimulation:
    """Coupled MC photoionization + finite-volume hydro on a Voronoi mesh.

    The Voronoi counterpart of RHDSimulation: per fixed-dt step, nloop MC
    ionization iterations over the cell graph → two-temperature ionization/
    energy coupling (HydroIntegrator.hpp:1288-1339, per-cell on the
    extensive state) → the moving-face Godunov update.  ``mesh_motion``
    turns on the Lagrangian mesh (generators follow the fluid, host
    re-tessellation per step).
    """

    def __init__(self, grid: VoronoiGrid, *, gamma, timestep, luminosity,
                 source_position, cross_section, recombination_rate,
                 n_photons, nloop, number_density, temperature,
                 neutral_temperature=100.0, ionised_temperature=1.0e4,
                 shock_temperature=3.0e4, mesh_motion=False,
                 second_order=True, seed=42, mesh=None):
        from cmacionize_tpu import constants

        if mesh is not None and mesh_motion:
            # a Lagrangian re-tessellation changes the replicated cell
            # tables every step, forcing a re-trace per step — not
            # supported; shard only static-mesh radiation
            raise NotImplementedError(
                "photon-DP radiation requires a static mesh "
                "(mesh_motion=False)")
        self.mesh = mesh
        self._dp_trace = None
        self.grid = grid
        self.gamma = float(gamma)
        self.dt = float(timestep)
        self.luminosity = luminosity
        self.source_position = np.asarray(source_position, float)
        self.sigma = cross_section
        self.alpha = recombination_rate
        self.n_photons = n_photons
        self.nloop = nloop
        self.neutral_temperature = neutral_temperature
        self.ionised_temperature = ionised_temperature
        self.shock_temperature = shock_temperature
        self.mesh_motion = bool(mesh_motion)
        #: MUSCL reconstruction on the cell graph (slope_factor 0.5 —
        #: full Barth-Jespersen slopes are marginally unstable on
        #: irregular Qhull meshes at D-type density contrasts; the damped
        #: slopes survive the full starbench_voronoi run and land the
        #: front closer to the Spitzer curve than first order)
        self.second_order = bool(second_order)
        self.key = jax.random.PRNGKey(seed)

        C = grid.n_cells
        # scalars OR per-cell [C] arrays (structured ICs sampled at the
        # generators, cf. the reference's DensityFunction evaluation per
        # Voronoi cell)
        nd0 = jnp.broadcast_to(
            jnp.asarray(number_density, jnp.float32), (C,))
        T0 = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), (C,))
        rho0 = nd0 * constants.PROTON_MASS
        p0 = nd0 * constants.BOLTZMANN * T0
        self.state = conserved_from_primitives(
            rho0, jnp.zeros(C, jnp.float32),
            jnp.zeros(C, jnp.float32), jnp.zeros(C, jnp.float32),
            p0, grid.volumes, self.gamma)
        self.neutral_fraction = jnp.ones(C, jnp.float32)
        self.time = 0.0

    # -------------------------------------------------------------- restart

    def write_restart(self, manager) -> str:
        """Checkpoint generator positions (the tessellation record — the
        moving mesh makes them live state), the extensive conserved state,
        the ionization state and the RNG chain (cf. DensityGrid restart,
        /root/reference/src/RestartManager.hpp:108-122)."""
        return manager.write({
            "generators": np.asarray(self.grid.generators),
            "rho": self.state.rho,
            "mom_x": self.state.mom_x,
            "mom_y": self.state.mom_y,
            "mom_z": self.state.mom_z,
            "energy": self.state.energy,
            "neutral_fraction": self.neutral_fraction,
            "rng_key": jax.random.key_data(self.key),
        }, {"time": self.time})

    def load_restart(self, filename: str) -> None:
        from cmacionize_tpu.io.restart import RestartManager
        from cmacionize_tpu.models.voronoi import rebuild_voronoi_grid

        arrays, scalars = RestartManager.load(filename)
        self.grid = rebuild_voronoi_grid(
            self.grid.geometry, np.asarray(arrays["generators"]))
        self._dp_trace = None  # re-bind the DP trace to the rebuilt tables
        self.state = VoronoiHydroState(
            rho=jnp.asarray(arrays["rho"]),
            mom_x=jnp.asarray(arrays["mom_x"]),
            mom_y=jnp.asarray(arrays["mom_y"]),
            mom_z=jnp.asarray(arrays["mom_z"]),
            energy=jnp.asarray(arrays["energy"]),
        )
        self.neutral_fraction = jnp.asarray(arrays["neutral_fraction"])
        self.key = jax.random.wrap_key_data(jnp.asarray(arrays["rng_key"]))
        self.time = float(scalars["time"])

    def _radiation(self, key):
        from cmacionize_tpu import constants
        from cmacionize_tpu.models.voronoi import (
            VoronoiPacketBatch, trace_packets_voronoi_cascade,
        )
        from cmacionize_tpu.ops import ionization

        grid = self.grid
        nd = self.state.rho / constants.PROTON_MASS
        src_u = ((self.source_position - np.asarray(grid.geometry.anchor))
                 / grid.scale)
        src_cell = int(grid.locate(src_u)[0])
        n_total = self.n_photons
        n_dev = 1
        if self.mesh is not None:
            # photon-DP radiation: replicated static tessellation, packet
            # shares per device, tallies psum'd (the radiation phase
            # dominates these workloads — 86% of the reference's
            # starbench_voronoi wall clock)
            n_dev = int(self.mesh.devices.size)
            per_dev = -(-self.n_photons // n_dev)
            n_total = per_dev * n_dev
            if self._dp_trace is None:
                from cmacionize_tpu.parallel.photon_dp import (
                    make_voronoi_dp_trace,
                )

                self._dp_trace = make_voronoi_dp_trace(
                    self.mesh, grid, n_photons_per_device=per_dev,
                    src_u=src_u, src_cell=src_cell)
        jfac = jnp.asarray(
            self.luminosity * self.sigma
            / (n_total * np.asarray(grid.volumes, np.float64)),
            jnp.float32)
        xh = self.neutral_fraction
        for _ in range(self.nloop):
            chi_si = nd * xh * self.sigma
            if self._dp_trace is not None:
                keys = jax.random.split(key, n_dev + 1)
                key = keys[0]
                tally, _ = self._dp_trace(keys[1:], chi_si)
            else:
                key, k1, k2 = jax.random.split(key, 3)
                dirn = jax.random.normal(k1, (self.n_photons, 3))
                dirn = dirn / jnp.linalg.norm(dirn, axis=1, keepdims=True)
                tau = -jnp.log(
                    1.0 - jax.random.uniform(k2, (self.n_photons,)))
                pos = jnp.tile(jnp.asarray(src_u, jnp.float32),
                               (self.n_photons, 1))
                packets = VoronoiPacketBatch(
                    pos, dirn.astype(jnp.float32),
                    jnp.full(self.n_photons, src_cell, jnp.int32),
                    tau.astype(jnp.float32),
                    jnp.ones(self.n_photons, jnp.float32),
                    jnp.ones(self.n_photons, bool),
                    jnp.zeros(self.n_photons, bool))
                tally, _, _ = trace_packets_voronoi_cascade(
                    grid, chi_si, packets)
            xh = ionization.hydrogen_neutral_fraction(
                tally * jfac, nd, self.alpha)
        return xh

    def _couple(self, state, xh):
        """Two-temperature ionization → energy coupling (heating only),
        per cell on the intensive state."""
        from cmacionize_tpu import constants

        rho = state.rho
        k_over_mp = constants.BOLTZMANN / constants.PROTON_MASS
        inv_rho = 1.0 / jnp.maximum(rho, 1e-300)
        vx = state.mom_x * inv_rho
        vy = state.mom_y * inv_rho
        vz = state.mom_z * inv_rho
        ekin = 0.5 * (state.mom_x * vx + state.mom_y * vy + state.mom_z * vz)
        u_spec = jnp.maximum((state.energy - ekin) * inv_rho, 0.0)
        T_target = (self.ionised_temperature * (1.0 - xh)
                    + self.neutral_temperature * xh)
        ufac = 2.0 * k_over_mp / ((self.gamma - 1.0) * (1.0 + xh))
        T_old = u_spec / jnp.maximum(ufac, 1e-300)
        du = ufac * T_target - u_spec
        heat = jnp.where(
            (du > 0.0) & (T_old < self.shock_temperature), du, 0.0)
        return state._replace(energy=state.energy + heat * rho)

    def run(self, n_steps, log=None):
        for step in range(n_steps):
            self.key, sub = jax.random.split(self.key)
            if self.nloop > 0:
                self.neutral_fraction = self._radiation(sub)
                self.state = self._couple(self.state, self.neutral_fraction)
            if self.mesh_motion:
                vel = grid_velocity_from_fluid(
                    self.grid, self.state, self.gamma)
            else:
                vel = np.zeros((self.grid.n_cells, 3), np.float32)
            self.state = voronoi_hydro_step(
                self.grid, self.state, vel, self.dt, self.gamma,
                second_order=self.second_order)
            if self.mesh_motion:
                old_volumes = self.grid.volumes
                self.grid = evolve_voronoi_grid(self.grid, vel, self.dt)
                self.state = remap_after_evolve(
                    self.state, old_volumes, self.grid.volumes)
            self.time += self.dt
            if log is not None and (step + 1) % 32 == 0:
                log(f"step {step + 1}/{n_steps} "
                    f"<xH>={float(jnp.mean(self.neutral_fraction)):.3f}")
        return self.state, self.neutral_fraction

    def ionization_front_radius(self) -> float:
        """Radius of the sphere with the ionized volume (m)."""
        xh = np.asarray(self.neutral_fraction)
        v_ion = float(((xh < 0.5) * np.asarray(self.grid.volumes)).sum())
        return (3.0 * v_ion / (4.0 * np.pi)) ** (1.0 / 3.0)
