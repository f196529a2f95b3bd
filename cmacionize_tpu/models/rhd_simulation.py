"""Radiation hydrodynamics: coupled MC photoionization + finite-volume hydro.

Equivalent of the reference's RadiationHydrodynamicsSimulation
(/root/reference/src/RadiationHydrodynamicsSimulation.cpp:155-803) for the
starbench-class problems: a fixed-Δt time loop where every step runs
`nloop` Monte Carlo ionization iterations on the *current* density field,
couples the ionization state to the gas energy through the two-temperature
scheme (HydroIntegrator.hpp:1288-1339 — ionized gas driven to T_ion, neutral
to T_neutral, shock-heated gas left alone), then advances the MUSCL-Hancock
hydro step.

The entire step (radiation loops + coupling + hydro) is one jitted function;
the Python loop only handles snapshots/logging.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cmacionize_tpu import constants
from cmacionize_tpu.models import sources
from cmacionize_tpu.models.grid import GridGeometry
from cmacionize_tpu.ops import hydro, ionization, traversal
from cmacionize_tpu.utils.logging import Log, NullLog


@dataclasses.dataclass(frozen=True)
class DensityBlock:
    """A BlockSyntax cube: constant density/temperature inside a box,
    cf. /root/reference/src/BlockSyntaxDensityFunction.hpp."""

    origin: Tuple[float, float, float]  # SI (center of the block)
    sides: Tuple[float, float, float]
    number_density: float  # m^-3
    temperature: float  # K


@dataclasses.dataclass(frozen=True)
class RHDConfig:
    geometry: GridGeometry
    gamma: float
    timestep: float  # s (fixed, cf. starbench minimum==maximum timestep)
    total_time: float  # s
    luminosity: float
    source_position: Tuple[float, float, float]
    cross_section: float
    recombination_rate: float
    n_photons: int
    nloop: int  # ionization iterations per radiation update
    background_density: float = 0.0  # m^-3
    background_temperature: float = 100.0
    blocks: Sequence[DensityBlock] = ()
    boundaries: Tuple = (
        (hydro.BC_REFLECTIVE, hydro.BC_REFLECTIVE),
        (hydro.BC_REFLECTIVE, hydro.BC_REFLECTIVE),
        (hydro.BC_REFLECTIVE, hydro.BC_REFLECTIVE),
    )
    neutral_temperature: float = 100.0
    ionised_temperature: float = 1.0e4
    shock_temperature: float = 3.0e4
    radiative_heating: bool = True
    radiative_cooling: bool = False
    initial_neutral_fraction: float = 1.0
    # "HLLC" or "Exact" — parameter-file selectable flux solver, mirroring
    # /root/reference/src/RiemannSolverFactory.hpp:54-57
    riemann_solver: str = "HLLC"


class RHDSimulation:
    """Driver for the coupled RHD time loop."""

    def __init__(self, config: RHDConfig, log: Optional[Log] = None, seed: int = 42):
        geom = config.geometry
        cell = geom.cell_size
        if not np.allclose(cell, cell[0], rtol=1e-6):
            raise NotImplementedError("cubic cells required")
        self.config = config
        self.log = log or NullLog()
        self.key = jax.random.PRNGKey(seed)
        self.geometry = geom
        self.dx = float(cell[0])

        # initial conditions: background + blocks
        centers = geom.cell_centers()
        nd = np.full(geom.shape, config.background_density)
        T = np.full(geom.shape, config.background_temperature)
        for block in config.blocks:
            origin = np.asarray(block.origin)
            half = 0.5 * np.asarray(block.sides)
            inside = np.all(np.abs(centers - origin) <= half, axis=-1)
            nd = np.where(inside, block.number_density, nd)
            T = np.where(inside, block.temperature, T)

        rho = nd * constants.PROTON_MASS
        pressure = nd * constants.BOLTZMANN * T
        w = hydro.Primitives(
            rho=jnp.asarray(rho, jnp.float32),
            vx=jnp.zeros(geom.shape, jnp.float32),
            vy=jnp.zeros(geom.shape, jnp.float32),
            vz=jnp.zeros(geom.shape, jnp.float32),
            p=jnp.asarray(pressure, jnp.float32),
        )
        self.state = hydro.conserved_from_primitives(w, config.gamma)
        self.neutral_fraction = jnp.full(
            geom.shape, config.initial_neutral_fraction, jnp.float32
        )
        self.time = 0.0
        self._source_gpos = tuple(
            float(g) for g in geom.position_to_grid_coords(config.source_position)
        )
        self._step_jit = jax.jit(self._step)

    # ------------------------------------------------------------------ core

    def _radiation_update(self, key, number_density, neutral_fraction):
        """nloop MC ionization iterations on the current density field."""
        cfg = self.config
        shape = self.geometry.shape
        sigma_dx = cfg.cross_section * self.dx
        jfac_scale = (
            cfg.luminosity * cfg.cross_section * self.dx
            / (cfg.n_photons * self.geometry.cell_volume)
        )
        for loop in range(cfg.nloop):
            key, subkey = jax.random.split(key)
            chi = (number_density * neutral_fraction * sigma_dx).reshape(-1)
            px, py, pz, dx, dy, dz, tau, _, weight = sources.emit_point_source(
                subkey, cfg.n_photons, self._source_gpos
            )
            packets = traversal.make_packets(
                jnp.stack([px, py, pz], 1), jnp.stack([dx, dy, dz], 1),
                tau, weight, shape,
            )
            tally = jnp.zeros(chi.shape, chi.dtype)
            tally, _ = traversal.trace_packets_auto(
                chi, packets, tally,
                shape=shape, periodic=self.geometry.periodic,
            )
            jH = tally.reshape(shape) * jfac_scale
            neutral_fraction = ionization.hydrogen_neutral_fraction(
                jH, number_density, cfg.recombination_rate
            )
        return neutral_fraction

    def _two_temperature_coupling(self, u, neutral_fraction):
        """Ionization → gas energy coupling (HydroIntegrator.hpp:1288-1339)."""
        cfg = self.config
        gamma = cfg.gamma
        xH = neutral_fraction
        w = hydro.primitives_from_conserved(u, gamma)

        k_over_mp = constants.BOLTZMANN / constants.PROTON_MASS
        T_target = cfg.ionised_temperature * (1.0 - xH) + cfg.neutral_temperature * xH
        # current gas temperature with mean-particle-mass correction
        T_old = 0.5 * (1.0 + xH) * w.p / (w.rho * k_over_mp)
        shock_heated = T_old > cfg.shock_temperature

        ufac = 2.0 * k_over_mp / ((gamma - 1.0) * (1.0 + xH))
        u_target = ufac * T_target
        u_old = w.p / ((gamma - 1.0) * w.rho)
        du = u_target - u_old
        dE = w.rho * du  # per unit volume

        delta = jnp.zeros_like(dE)
        if cfg.radiative_heating:
            delta = jnp.where(dE > 0.0, dE, delta)
        if cfg.radiative_cooling:
            dE_lim = jnp.maximum(
                dE,
                2.0 * ufac
                * (cfg.neutral_temperature - cfg.ionised_temperature)
                * w.rho,
            )
            # factor 1/2 for the mean-particle-mass change (reference :1330)
            delta = jnp.where(dE < 0.0, 0.5 * dE_lim, delta)
        delta = jnp.where(shock_heated, 0.0, delta)
        return u._replace(energy=u.energy + delta)

    def _step(self, key, u, neutral_fraction):
        cfg = self.config
        number_density = (
            hydro.primitives_from_conserved(u, cfg.gamma).rho
            / constants.PROTON_MASS
        )
        neutral_fraction = self._radiation_update(key, number_density, neutral_fraction)
        u = self._two_temperature_coupling(u, neutral_fraction)
        u = hydro.hydro_step(
            u,
            cfg.timestep,
            boundaries=cfg.boundaries,
            cell_size=(self.dx,) * 3,
            gamma=cfg.gamma,
            riemann_solver=cfg.riemann_solver,
        )
        return u, neutral_fraction

    # ------------------------------------------------------------------- run

    def run(
        self,
        n_steps: Optional[int] = None,
        log_every: int = 50,
        restart_manager=None,
        statistics=None,
    ):
        """Advance the simulation.

        ``restart_manager``: optional io.restart.RestartManager — checkpoints
        are written on its wall-clock cadence and on SIGINT (graceful stop,
        cf. the reference's RestartManager + Signals integration).
        ``statistics``: optional utils.statistics.StatisticsLogger.
        """
        from cmacionize_tpu.utils import signals

        signals.install()
        cfg = self.config
        if n_steps is None:
            n_steps = int(round(cfg.total_time / cfg.timestep))
        for step in range(n_steps):
            self.key, subkey = jax.random.split(self.key)
            self.state, self.neutral_fraction = self._step_jit(
                subkey, self.state, self.neutral_fraction
            )
            self.time += cfg.timestep
            if (step + 1) % log_every == 0 or step == n_steps - 1:
                w = hydro.primitives_from_conserved(self.state, cfg.gamma)
                self.log.info(
                    f"step {step + 1}/{n_steps} t={self.time / 3.156e13:.4f} Myr "
                    f"max|v|={float(jnp.max(jnp.abs(w.vx))):.3g} m/s "
                    f"<xH>={float(jnp.mean(self.neutral_fraction)):.3f}"
                )
            if statistics is not None:
                statistics.log(self.time, self.state, self.geometry.cell_volume)
            stopping = signals.stop_requested() or (
                restart_manager is not None and restart_manager.want_stop()
            )
            if restart_manager is not None and (restart_manager.due() or stopping):
                self.write_restart(restart_manager)
            if stopping:
                self.log.warning("graceful stop requested; exiting time loop")
                if restart_manager is not None:
                    restart_manager.on_stop()
                break
        return self.state, self.neutral_fraction

    # -------------------------------------------------------------- restart

    def write_restart(self, manager) -> str:
        arrays = {
            "rho": self.state.rho,
            "mom_x": self.state.mom_x,
            "mom_y": self.state.mom_y,
            "mom_z": self.state.mom_z,
            "energy": self.state.energy,
            "neutral_fraction": self.neutral_fraction,
            "rng_key": jax.random.key_data(self.key),
        }
        return manager.write(arrays, {"time": self.time})

    def load_restart(self, filename: str) -> None:
        from cmacionize_tpu.io.restart import RestartManager
        from cmacionize_tpu.ops.hydro import HydroState

        arrays, scalars = RestartManager.load(filename)
        self.state = HydroState(
            rho=jnp.asarray(arrays["rho"]),
            mom_x=jnp.asarray(arrays["mom_x"]),
            mom_y=jnp.asarray(arrays["mom_y"]),
            mom_z=jnp.asarray(arrays["mom_z"]),
            energy=jnp.asarray(arrays["energy"]),
        )
        self.neutral_fraction = jnp.asarray(arrays["neutral_fraction"])
        self.key = jax.random.wrap_key_data(jnp.asarray(arrays["rng_key"]))
        self.time = float(scalars["time"])

    # ------------------------------------------------------------- analysis

    def ionization_front_radius(self) -> float:
        """Radius of the ionized region around the source (m)."""
        xH = np.asarray(self.neutral_fraction)
        v_ion = float((xH < 0.5).sum()) * self.geometry.cell_volume
        # source at a box corner with reflective boundaries → the box models
        # one octant of the full sphere
        corner = all(
            abs(g) < 1e-6 or abs(g - s) < 1e-6
            for g, s in zip(self._source_gpos, self.geometry.shape)
        )
        if corner:
            v_ion *= 8.0
        return (3.0 * v_ion / (4.0 * np.pi)) ** (1.0 / 3.0)


def spitzer_radius(t, stromgren_radius, sound_speed_ionized=12.85e3):
    """Spitzer D-type expansion law R(t) = R_St (1 + 7 c_i t / (4 R_St))^{4/7}
    (Bisbas et al. 2015 starbench, eq. 4)."""
    return stromgren_radius * (
        1.0 + 7.0 * sound_speed_ionized * t / (4.0 * stromgren_radius)
    ) ** (4.0 / 7.0)


def hosokawa_inutsuka_radius(t, stromgren_radius, sound_speed_ionized=12.85e3):
    """Hosokawa-Inutsuka expansion law (Bisbas et al. 2015, eq. 5)."""
    return stromgren_radius * (
        1.0
        + 7.0 * sound_speed_ionized * t / (4.0 * stromgren_radius) * np.sqrt(4.0 / 3.0)
    ) ** (4.0 / 7.0)
