"""Analytic Bondi accretion profile (isothermal, with optional ionized core).

Equivalent of /root/reference/src/BondiProfile.hpp: the transonic isothermal
Bondi solution expressed through the Lambert W function,

    v/c_s = sqrt(-W_k(-(R_B/r)^4 exp(3 - 4 R_B/r))),   R_B = G M / (2 c_s²)

with branch k=0 outside the Bondi radius and k=-1 inside;
ρ = (R_B/r)² ρ_B / (v/c_s), P = c_s² ρ.  Used for initial conditions and
for the spatially-varying "bondi" inflow ghost cells — both precomputed on
the host (scipy lambertw), so no device Lambert W is needed.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
from scipy.special import lambertw

from cmacionize_tpu import constants


@dataclasses.dataclass(frozen=True)
class BondiProfile:
    central_mass: float  # kg
    bondi_density: float  # kg m^-3 (density at the Bondi radius)
    sound_speed: float  # m/s
    center: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    @property
    def bondi_radius(self) -> float:
        return (
            0.5 * constants.NEWTON_CONSTANT * self.central_mass
            / self.sound_speed**2
        )

    def evaluate(self, positions: np.ndarray):
        """positions [..., 3] (SI) → (rho, velocity [..., 3], pressure).

        Matches the reference's evaluation including the rB < 184.5
        divergence cutoff (BondiProfile.hpp:118-160).
        """
        rel = positions - np.asarray(self.center)
        radius = np.sqrt((rel**2).sum(-1))
        radius = np.maximum(radius, 1e-30)
        rB = self.bondi_radius / radius

        with np.errstate(over="ignore", invalid="ignore"):
            arg = -(rB**4) * np.exp(3.0 - 4.0 * rB)
            arg = np.clip(arg, -np.exp(-1.0), 0.0)
            w0 = np.real(lambertw(arg, 0))
            wm1 = np.real(lambertw(arg, -1))
        v_cs = np.where(radius > self.bondi_radius, np.sqrt(-w0), np.sqrt(-wm1))

        apply = rB < 184.5
        v_cs = np.where(apply, v_cs, 1.0)
        rho = np.where(
            apply, rB**2 * self.bondi_density / v_cs, self.bondi_density
        )
        vB = -v_cs * self.sound_speed
        pressure = self.sound_speed**2 * rho
        velocity = vB[..., None] * rel / radius[..., None]
        return rho, velocity, pressure
