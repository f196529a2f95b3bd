"""De Rijcke et al. (2013) tabulated optically-thin radiative cooling.

Equivalent of /root/reference/src/DeRijckeRadiativeCooling.cpp: the published
solar-metallicity cooling curve Λ(T) (normalized per n_H², repackaged in
cmacionize_tpu/data/derijcke_cooling.npz from the reference's data table;
T ∈ [10 K, 1e9 K]) with log-log interpolation, plus the substepped explicit
cooling update used by the RHD drivers
(cf. `do_cooling`, /root/reference/src/TaskBasedRadiationHydrodynamics\
Simulation.cpp:760-820).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cmacionize_tpu import constants
from cmacionize_tpu.data import _load


def _tables():
    data = _load("derijcke_cooling.npz")
    return (
        np.log(data["temperatures"]),
        np.log(np.maximum(data["lambda_cool"], 1e-300)),
    )


def cooling_rate(T):
    """Λ(T) in J m³ s⁻¹ (multiply by n_H² for the volumetric rate)."""
    log_t_tab, log_l_tab = _tables()
    logT = jnp.log(jnp.clip(jnp.asarray(T), np.exp(log_t_tab[0]), np.exp(log_t_tab[-1])))
    return jnp.exp(jnp.interp(logT, jnp.asarray(log_t_tab), jnp.asarray(log_l_tab)))


def cooling_substep(u, dt, gamma: float, n_substeps: int = 8, mu: float = 1.0):
    """Explicit substepped cooling of a HydroState.

    Each substep removes Λ(T)·n_H²·Δt from the thermal energy with a floor at
    the table minimum, matching the reference's bounded explicit scheme.
    """
    from cmacionize_tpu.ops import hydro

    k_over_mp = constants.BOLTZMANN / constants.PROTON_MASS
    sub_dt = dt / n_substeps

    def body(_, u):
        w = hydro.primitives_from_conserved(u, gamma)
        n_h = w.rho / constants.PROTON_MASS
        T = mu * w.p / (w.rho * k_over_mp)
        rate = cooling_rate(T) * n_h * n_h  # J m^-3 s^-1
        thermal = w.p / (gamma - 1.0)
        new_thermal = jnp.maximum(thermal - rate * sub_dt, 1e-3 * thermal)
        delta = (thermal - new_thermal).astype(u.energy.dtype)
        return u._replace(energy=u.energy - delta)

    return jax.lax.fori_loop(0, n_substeps, body, u)
