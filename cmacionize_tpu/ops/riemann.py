"""Riemann solvers for the finite-volume hydro scheme (vectorized).

Equivalents of the reference's RiemannSolver family
(/root/reference/src/HLLCRiemannSolver.hpp:44-320,
/root/reference/src/ExactRiemannSolver.hpp:866): pure jnp functions mapping
batched left/right primitive states to interface fluxes, applied to whole
face arrays at once — the per-face virtual call of the reference becomes one
fused elementwise pass on the VPU.

State convention per interface: density rho, normal velocity u, tangential
velocities v, w, pressure p.  Returned fluxes are (mass, normal momentum,
tangential momenta, energy) in the face frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FaceFlux(NamedTuple):
    mass: jnp.ndarray
    mom_n: jnp.ndarray  # normal momentum
    mom_t1: jnp.ndarray
    mom_t2: jnp.ndarray
    energy: jnp.ndarray


def _energy(rho, u, v, w, p, gamma):
    return p / (gamma - 1.0) + 0.5 * rho * (u * u + v * v + w * w)


def _physical_flux(rho, u, v, w, p, gamma):
    e = _energy(rho, u, v, w, p, gamma)
    return FaceFlux(
        mass=rho * u,
        mom_n=rho * u * u + p,
        mom_t1=rho * u * v,
        mom_t2=rho * u * w,
        energy=(e + p) * u,
    )


def hllc_flux(
    rhoL, uL, vL, wL, pL,
    rhoR, uR, vR, wR, pR,
    gamma: float = 5.0 / 3.0,
):
    """HLLC approximate Riemann solver (Toro ch. 10), vacuum-safe.

    Wave-speed estimates use the primitive-variable pressure estimate with
    rarefaction/shock q-factors, the same scheme as the reference
    (/root/reference/src/HLLCRiemannSolver.hpp:83-200).  Dry (zero-density)
    states short-circuit to zero flux contributions.
    """
    tiny = 1e-30
    okL = rhoL > tiny
    okR = rhoR > tiny
    srhoL = jnp.where(okL, rhoL, 1.0)
    srhoR = jnp.where(okR, rhoR, 1.0)
    spL = jnp.maximum(pL, 0.0)
    spR = jnp.maximum(pR, 0.0)

    aL = jnp.sqrt(gamma * spL / srhoL)
    aR = jnp.sqrt(gamma * spR / srhoR)

    # PVRS pressure estimate
    rho_bar = 0.5 * (srhoL + srhoR)
    a_bar = 0.5 * (aL + aR)
    p_pvrs = 0.5 * (spL + spR) - 0.5 * (uR - uL) * rho_bar * a_bar
    p_star = jnp.maximum(0.0, p_pvrs)

    def q_factor(p_star, p):
        sp = jnp.where(p > tiny, p, 1.0)
        ratio = p_star / sp
        q_shock = jnp.sqrt(1.0 + (gamma + 1.0) / (2.0 * gamma) * (ratio - 1.0))
        return jnp.where(ratio > 1.0, q_shock, 1.0)

    SL = uL - aL * q_factor(p_star, spL)
    SR = uR + aR * q_factor(p_star, spR)

    denom = srhoL * (SL - uL) - srhoR * (SR - uR)
    safe_denom = jnp.where(jnp.abs(denom) > tiny, denom, tiny)
    S_star = (
        spR - spL + srhoL * uL * (SL - uL) - srhoR * uR * (SR - uR)
    ) / safe_denom

    fL = _physical_flux(srhoL, uL, vL, wL, spL, gamma)
    fR = _physical_flux(srhoR, uR, vR, wR, spR, gamma)

    def star_flux(f, rho, u, v, w, p, S, S_star):
        """F* = F + S (U* - U) with the HLLC star state."""
        e = _energy(rho, u, v, w, p, gamma)
        coef = rho * (S - u) / jnp.where(jnp.abs(S - S_star) > tiny, S - S_star, tiny)
        rho_star = coef
        mom_n_star = coef * S_star
        mom_t1_star = coef * v
        mom_t2_star = coef * w
        denom = rho * (S - u)
        safe_denom_su = jnp.where(jnp.abs(denom) > tiny, denom, tiny)
        e_star = coef * (
            e / rho + (S_star - u) * (S_star + p / safe_denom_su)
        )
        return FaceFlux(
            mass=f.mass + S * (rho_star - rho),
            mom_n=f.mom_n + S * (mom_n_star - rho * u),
            mom_t1=f.mom_t1 + S * (mom_t1_star - rho * v),
            mom_t2=f.mom_t2 + S * (mom_t2_star - rho * w),
            energy=f.energy + S * (e_star - e),
        )

    fLs = star_flux(fL, srhoL, uL, vL, wL, spL, SL, S_star)
    fRs = star_flux(fR, srhoR, uR, vR, wR, spR, SR, S_star)

    def pick(component_fL, component_fLs, component_fRs, component_fR):
        out = jnp.where(SL >= 0.0, component_fL, 0.0)
        out = jnp.where((SL < 0.0) & (S_star >= 0.0), component_fLs, out)
        out = jnp.where((S_star < 0.0) & (SR > 0.0), component_fRs, out)
        out = jnp.where(SR <= 0.0, component_fR, out)
        return out

    flux = FaceFlux(
        mass=pick(fL.mass, fLs.mass, fRs.mass, fR.mass),
        mom_n=pick(fL.mom_n, fLs.mom_n, fRs.mom_n, fR.mom_n),
        mom_t1=pick(fL.mom_t1, fLs.mom_t1, fRs.mom_t1, fR.mom_t1),
        mom_t2=pick(fL.mom_t2, fLs.mom_t2, fRs.mom_t2, fR.mom_t2),
        energy=pick(fL.energy, fLs.energy, fRs.energy, fR.energy),
    )

    # both-sides-vacuum faces carry no flux
    any_gas = okL | okR
    return FaceFlux(*(jnp.where(any_gas, f, 0.0) for f in flux))


# --------------------------------------------------------------------------
# Exact (iterative) Riemann solver — used for validation and golden tests,
# equivalent of /root/reference/src/ExactRiemannSolver.hpp (Toro ch. 4).
# --------------------------------------------------------------------------


def _fK(p, rhoK, pK, aK, gamma):
    """Toro's f_K(p): rarefaction/shock relation for one side."""
    AK = 2.0 / ((gamma + 1.0) * rhoK)
    BK = (gamma - 1.0) / (gamma + 1.0) * pK
    shock = (p - pK) * jnp.sqrt(AK / (p + BK))
    raref = (
        2.0 * aK / (gamma - 1.0)
        * ((p / pK) ** ((gamma - 1.0) / (2.0 * gamma)) - 1.0)
    )
    return jnp.where(p > pK, shock, raref)


def _fK_prime(p, rhoK, pK, aK, gamma):
    AK = 2.0 / ((gamma + 1.0) * rhoK)
    BK = (gamma - 1.0) / (gamma + 1.0) * pK
    shock = jnp.sqrt(AK / (p + BK)) * (1.0 - 0.5 * (p - pK) / (p + BK))
    raref = (p / pK) ** (-(gamma + 1.0) / (2.0 * gamma)) / (rhoK * aK)
    return jnp.where(p > pK, shock, raref)


def exact_star_pressure(rhoL, uL, pL, rhoR, uR, pR, gamma=5.0 / 3.0, n_iter=40):
    """Newton–Raphson for the star-region pressure (vectorized, fixed count)."""
    aL = jnp.sqrt(gamma * pL / rhoL)
    aR = jnp.sqrt(gamma * pR / rhoR)
    du = uR - uL
    # two-rarefaction initial guess (robust for all cases)
    gz = (gamma - 1.0) / (2.0 * gamma)
    p0 = (
        (aL + aR - 0.5 * (gamma - 1.0) * du)
        / (aL / pL**gz + aR / pR**gz)
    ) ** (1.0 / gz)
    p0 = jnp.maximum(p0, 1e-10 * jnp.minimum(pL, pR))

    def body(_, p):
        f = _fK(p, rhoL, pL, aL, gamma) + _fK(p, rhoR, pR, aR, gamma) + du
        fp = _fK_prime(p, rhoL, pL, aL, gamma) + _fK_prime(p, rhoR, pR, aR, gamma)
        p_new = p - f / jnp.maximum(fp, 1e-30)
        return jnp.maximum(p_new, 1e-10 * p)

    p_star = jax.lax.fori_loop(0, n_iter, body, p0)
    u_star = 0.5 * (uL + uR) + 0.5 * (
        _fK(p_star, rhoR, pR, aR, gamma) - _fK(p_star, rhoL, pL, aL, gamma)
    )
    return p_star, u_star


def exact_sample(rhoL, uL, pL, rhoR, uR, pR, s, gamma=5.0 / 3.0, n_iter=40):
    """Sample the exact Riemann solution at speed s = x/t (Toro §4.5).

    Returns (rho, u, p) at the sample point; used for Sod-type golden tests.
    """
    aL = jnp.sqrt(gamma * pL / rhoL)
    aR = jnp.sqrt(gamma * pR / rhoR)
    p_star, u_star = exact_star_pressure(rhoL, uL, pL, rhoR, uR, pR, gamma, n_iter)
    g1 = (gamma - 1.0) / (gamma + 1.0)

    # left side (s < u_star)
    rho_star_L_shock = rhoL * (p_star / pL + g1) / (g1 * p_star / pL + 1.0)
    rho_star_L_raref = rhoL * (p_star / pL) ** (1.0 / gamma)
    SL_shock = uL - aL * jnp.sqrt(
        (gamma + 1.0) / (2.0 * gamma) * p_star / pL
        + (gamma - 1.0) / (2.0 * gamma)
    )
    aL_star = aL * (p_star / pL) ** ((gamma - 1.0) / (2.0 * gamma))
    SHL = uL - aL  # rarefaction head
    STL = u_star - aL_star  # rarefaction tail

    # inside left fan
    fan_u_L = 2.0 / (gamma + 1.0) * (aL + 0.5 * (gamma - 1.0) * uL + s)
    fan_a_L = 2.0 / (gamma + 1.0) * (aL + 0.5 * (gamma - 1.0) * (uL - s))
    fan_rho_L = rhoL * (fan_a_L / aL) ** (2.0 / (gamma - 1.0))
    fan_p_L = pL * (fan_a_L / aL) ** (2.0 * gamma / (gamma - 1.0))

    left_shock = p_star > pL

    def left_state():
        # shock branch
        rho_sh = jnp.where(s < SL_shock, rhoL, rho_star_L_shock)
        u_sh = jnp.where(s < SL_shock, uL, u_star)
        p_sh = jnp.where(s < SL_shock, pL, p_star)
        # rarefaction branch
        rho_rf = jnp.where(
            s < SHL, rhoL, jnp.where(s > STL, rho_star_L_raref, fan_rho_L)
        )
        u_rf = jnp.where(s < SHL, uL, jnp.where(s > STL, u_star, fan_u_L))
        p_rf = jnp.where(s < SHL, pL, jnp.where(s > STL, p_star, fan_p_L))
        rho = jnp.where(left_shock, rho_sh, rho_rf)
        u = jnp.where(left_shock, u_sh, u_rf)
        p = jnp.where(left_shock, p_sh, p_rf)
        return rho, u, p

    # right side (s > u_star)
    rho_star_R_shock = rhoR * (p_star / pR + g1) / (g1 * p_star / pR + 1.0)
    rho_star_R_raref = rhoR * (p_star / pR) ** (1.0 / gamma)
    SR_shock = uR + aR * jnp.sqrt(
        (gamma + 1.0) / (2.0 * gamma) * p_star / pR
        + (gamma - 1.0) / (2.0 * gamma)
    )
    aR_star = aR * (p_star / pR) ** ((gamma - 1.0) / (2.0 * gamma))
    SHR = uR + aR
    STR = u_star + aR_star

    fan_u_R = 2.0 / (gamma + 1.0) * (-aR + 0.5 * (gamma - 1.0) * uR + s)
    fan_a_R = 2.0 / (gamma + 1.0) * (aR - 0.5 * (gamma - 1.0) * (uR - s))
    fan_rho_R = rhoR * (fan_a_R / aR) ** (2.0 / (gamma - 1.0))
    fan_p_R = pR * (fan_a_R / aR) ** (2.0 * gamma / (gamma - 1.0))

    right_shock = p_star > pR

    def right_state():
        rho_sh = jnp.where(s > SR_shock, rhoR, rho_star_R_shock)
        u_sh = jnp.where(s > SR_shock, uR, u_star)
        p_sh = jnp.where(s > SR_shock, pR, p_star)
        rho_rf = jnp.where(
            s > SHR, rhoR, jnp.where(s < STR, rho_star_R_raref, fan_rho_R)
        )
        u_rf = jnp.where(s > SHR, uR, jnp.where(s < STR, u_star, fan_u_R))
        p_rf = jnp.where(s > SHR, pR, jnp.where(s < STR, p_star, fan_p_R))
        rho = jnp.where(right_shock, rho_sh, rho_rf)
        u = jnp.where(right_shock, u_sh, u_rf)
        p = jnp.where(right_shock, p_sh, p_rf)
        return rho, u, p

    rhoLs, uLs, pLs = left_state()
    rhoRs, uRs, pRs = right_state()
    on_left = s <= u_star
    return (
        jnp.where(on_left, rhoLs, rhoRs),
        jnp.where(on_left, uLs, uRs),
        jnp.where(on_left, pLs, pRs),
    )


def exact_flux(
    rhoL, uL, vL, wL, pL, rhoR, uR, vR, wR, pR,
    gamma=5.0 / 3.0, n_iter=20,
) -> FaceFlux:
    """Exact Riemann interface flux with full vacuum handling.

    Production counterpart of hllc_flux, selectable through the parameter
    file like the reference's RiemannSolverFactory
    (/root/reference/src/RiemannSolverFactory.hpp:54-57): the exact solution
    is sampled at s = x/t = 0 and converted to the physical flux.  The four
    vacuum branches of ExactRiemannSolver.hpp:866 are folded in as masks:
    vacuum left/right states, vacuum generation when
    2(a_L + a_R)/(γ-1) ≤ u_R - u_L, and the trivial both-vacuum case.
    Tangential velocities are upwinded by the sign of the sampled normal
    velocity at the interface.
    """
    tiny = 1e-40
    # the reference also treats P == 0 as vacuum (ExactRiemannSolver.hpp
    # vacuum check): a cold zero-pressure state must take the vacuum
    # branches, not a clamped Newton solve
    vac_L = (rhoL <= tiny) | (pL <= tiny)
    vac_R = (rhoR <= tiny) | (pR <= tiny)
    rhoL_s = jnp.where(vac_L, 1.0, rhoL)
    pL_s = jnp.where(vac_L, 1.0, jnp.maximum(pL, tiny))
    rhoR_s = jnp.where(vac_R, 1.0, rhoR)
    pR_s = jnp.where(vac_R, 1.0, jnp.maximum(pR, tiny))
    aL = jnp.sqrt(gamma * pL_s / rhoL_s)
    aR = jnp.sqrt(gamma * pR_s / rhoR_s)
    gm1 = gamma - 1.0

    # vacuum generation: the two rarefactions separate completely
    vac_gen = (~vac_L) & (~vac_R) & (
        2.0 * (aL + aR) / gm1 <= uR - uL)

    # --- regular exact solution sampled at s = 0 -------------------------
    rho0, u0, p0 = exact_sample(
        rhoL_s, uL, pL_s, rhoR_s, uR, pR_s, jnp.zeros_like(rhoL_s),
        gamma=gamma, n_iter=n_iter)

    # --- one-sided rarefaction into vacuum (Toro §4.6) -------------------
    def _left_into_vacuum():
        # right state is vacuum: head uL - aL, vacuum front uL + 2aL/(γ-1)
        shl = uL - aL
        svl = uL + 2.0 * aL / gm1
        fan_a = jnp.maximum(2.0 / (gamma + 1.0) * (aL + 0.5 * gm1 * uL), 0.0)
        fan_u = 2.0 / (gamma + 1.0) * (aL + 0.5 * gm1 * uL)
        fan_rho = rhoL_s * (fan_a / aL) ** (2.0 / gm1)
        fan_p = pL_s * (fan_a / aL) ** (2.0 * gamma / gm1)
        rho = jnp.where(shl >= 0.0, rhoL_s, jnp.where(svl <= 0.0, 0.0, fan_rho))
        u = jnp.where(shl >= 0.0, uL, jnp.where(svl <= 0.0, 0.0, fan_u))
        p = jnp.where(shl >= 0.0, pL_s, jnp.where(svl <= 0.0, 0.0, fan_p))
        return rho, u, p

    def _right_into_vacuum():
        shr = uR + aR
        svr = uR - 2.0 * aR / gm1
        fan_a = jnp.maximum(2.0 / (gamma + 1.0) * (aR - 0.5 * gm1 * uR), 0.0)
        fan_u = 2.0 / (gamma + 1.0) * (-aR + 0.5 * gm1 * uR)
        fan_rho = rhoR_s * (fan_a / aR) ** (2.0 / gm1)
        fan_p = pR_s * (fan_a / aR) ** (2.0 * gamma / gm1)
        rho = jnp.where(shr <= 0.0, rhoR_s, jnp.where(svr >= 0.0, 0.0, fan_rho))
        u = jnp.where(shr <= 0.0, uR, jnp.where(svr >= 0.0, 0.0, fan_u))
        p = jnp.where(shr <= 0.0, pR_s, jnp.where(svr >= 0.0, 0.0, fan_p))
        return rho, u, p

    rho_lv, u_lv, p_lv = _left_into_vacuum()
    rho_rv, u_rv, p_rv = _right_into_vacuum()

    # vacuum generation: left fan for s < vacuum front, right fan beyond
    svl = uL + 2.0 * aL / gm1
    rho_vg = jnp.where(svl >= 0.0, rho_lv, rho_rv)
    u_vg = jnp.where(svl >= 0.0, u_lv, u_rv)
    p_vg = jnp.where(svl >= 0.0, p_lv, p_rv)

    rho = jnp.where(
        vac_L & vac_R, 0.0,
        jnp.where(vac_R, rho_lv,
                  jnp.where(vac_L, rho_rv,
                            jnp.where(vac_gen, rho_vg, rho0))))
    u = jnp.where(
        vac_L & vac_R, 0.0,
        jnp.where(vac_R, u_lv,
                  jnp.where(vac_L, u_rv, jnp.where(vac_gen, u_vg, u0))))
    p = jnp.where(
        vac_L & vac_R, 0.0,
        jnp.where(vac_R, p_lv,
                  jnp.where(vac_L, p_rv, jnp.where(vac_gen, p_vg, p0))))

    # tangential velocities ride the contact: upwind by the interface u
    v = jnp.where(u > 0.0, vL, vR)
    w = jnp.where(u > 0.0, wL, wR)
    return _physical_flux(rho, u, v, w, p, gamma)
