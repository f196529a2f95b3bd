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
    """Transonic Bondi solution, optionally with an ionised inner core.

    With ``ionisation_radius`` > 0 and ``pressure_contrast`` > 0 the profile
    switches at R_I to the pressure-jumped ionised branch of Vandenbroucke,
    Wood & Vandenbroucke (2019): density and velocity at R_I are rescaled by
    Γ (BondiProfile.hpp:182-205) and the interior velocity follows the
    modified Lambert-W solution (BondiProfile.hpp:276-291).  A tangential
    ``vprof`` rotation profile can be superimposed (:330-340).
    """

    central_mass: float  # kg
    bondi_density: float  # kg m^-3 (density at the Bondi radius)
    sound_speed: float  # m/s
    center: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    ionisation_radius: float = 0.0  # m
    pressure_contrast: float = 0.0
    vprof_radius: float = 0.0  # m
    vprof_velocity: float = 0.0  # m/s

    @property
    def bondi_radius(self) -> float:
        return (
            0.5 * constants.NEWTON_CONSTANT * self.central_mass
            / self.sound_speed**2
        )

    @property
    def _core(self):
        """(rho_I, v_I) at the ionisation radius (BondiProfile.hpp:182-205)."""
        rBI = self.bondi_radius / self.ionisation_radius
        arg = -(rBI**4) * np.exp(3.0 - 4.0 * rBI)
        v_RI = float(np.sqrt(-np.real(lambertw(arg, -1))))
        rho_RI = rBI**2 * self.bondi_density / v_RI
        v_RI *= -self.sound_speed
        cs2 = self.sound_speed**2
        a = v_RI**2 / (self.pressure_contrast * cs2) + 1.0 / self.pressure_contrast
        gamma = 0.5 * (
            a - np.sqrt(a * a - 4.0 * v_RI**2 / (self.pressure_contrast * cs2))
        )
        return gamma * rho_RI, v_RI / gamma

    def evaluate(self, positions: np.ndarray):
        """positions [..., 3] (SI) → (rho, velocity [..., 3], pressure,
        neutral_fraction).

        Matches the reference's evaluation including the rB < 184.5
        divergence cutoff (BondiProfile.hpp:118-160) and the ionised-core
        branch (:276-305).
        """
        rel = positions - np.asarray(self.center)
        radius = np.sqrt((rel**2).sum(-1))
        radius = np.maximum(radius, 1e-30)
        rB = self.bondi_radius / radius
        cs2 = self.sound_speed**2

        with np.errstate(over="ignore", invalid="ignore"):
            arg = -(rB**4) * np.exp(3.0 - 4.0 * rB)
            arg = np.clip(arg, -np.exp(-1.0), 0.0)
            w0 = np.real(lambertw(arg, 0))
            wm1 = np.real(lambertw(arg, -1))
        v_cs = np.where(radius > self.bondi_radius, np.sqrt(-w0), np.sqrt(-wm1))

        ionised = np.zeros(radius.shape, bool)
        if self.ionisation_radius > 0.0 and self.pressure_contrast > 0.0:
            rho_I, v_I = self._core
            ionised = radius < self.ionisation_radius
            with np.errstate(over="ignore", invalid="ignore"):
                RIr = self.ionisation_radius / radius
                vI2 = v_I**2 / (self.pressure_contrast * cs2)
                arg2 = (
                    -(RIr**4) * vI2
                    * np.exp(
                        4.0 * self.bondi_radius / self.pressure_contrast
                        * (1.0 / self.ionisation_radius - 1.0 / radius)
                        - vI2
                    )
                )
                arg2 = np.clip(arg2, -np.exp(-1.0), 0.0)
                v_core = np.sqrt(
                    -self.pressure_contrast * np.real(lambertw(arg2, -1))
                )
            v_cs = np.where(ionised, v_core, v_cs)

        apply = rB < 184.5
        v_cs = np.where(apply, v_cs, 1.0)
        vB = np.where(apply, -v_cs * self.sound_speed, -self.sound_speed)
        rho = np.where(
            apply, rB**2 * self.bondi_density / v_cs, self.bondi_density
        )
        pressure = cs2 * rho
        xh = np.where(apply, 1.0, 1.0)
        if self.ionisation_radius > 0.0 and self.pressure_contrast > 0.0:
            rho_core = (
                rho_I * self.ionisation_radius**2 * v_I / (radius**2 * vB)
            )
            rho = np.where(apply & ionised, rho_core, rho)
            pressure = np.where(
                apply & ionised, cs2 * self.pressure_contrast * rho, pressure
            )
            xh = np.where(apply & ionised, 0.0, xh)
        velocity = vB[..., None] * rel / radius[..., None]
        if self.vprof_radius > 0.0 and self.vprof_velocity > 0.0:
            Rcyl = np.maximum(
                np.sqrt(rel[..., 0] ** 2 + rel[..., 1] ** 2), 1e-30
            )
            vphi = self.vprof_velocity * self.vprof_radius / radius
            velocity = velocity.copy()
            velocity[..., 0] -= rel[..., 1] * vphi / Rcyl
            velocity[..., 1] += rel[..., 0] * vphi / Rcyl
        return rho, velocity, pressure, xh
