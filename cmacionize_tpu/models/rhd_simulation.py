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
    """Driver for the coupled RHD time loop.

    Optional physics (all selectable from the parameter file via
    :meth:`from_params`, mirroring
    /root/reference/src/RadiationHydrodynamicsSimulation.cpp:250-392,631-654):

    - ``gravity``: static (gx, gy, gz) acceleration fields (external
      potentials, precomputed on cell centers)
    - ``self_gravity``: FFT Poisson self-gravity recomputed from the live
      density each step (design delta vs the reference's Barnes-Hut tree,
      documented in ops/potentials.py)
    - ``cooling``: De Rijcke optically-thin radiative cooling substeps
    - ``forcing``: Alvelius spectral turbulence forcing (new random phases
      per step, cf. TaskBasedRadiationHydrodynamicsSimulation.cpp:2030-2062)
    - ``mask``/``mask_state``: HydroMask — masked cells reset to the held
      state after every step (BlockSyntaxHydroMask equivalent)
    - ``inflow_states``: per-face ghost primitives for BC_INFLOW (the Bondi
      boundary, cf. BondiHydroBoundary.hpp)
    - ``isothermal_sound_speed``: isothermal EOS (reference
      ``polytropic index: 1.``)
    - ``source_distribution``: time-dependent source population with
      ``update(t)`` + SN stellar feedback
      (cf. RadiationHydrodynamicsSimulation.cpp:529-535)
    - ``initial``: DensityFields override for structured ICs (any
      DensityFunction type incl. BondiProfile)
    """

    def __init__(self, config: RHDConfig, log: Optional[Log] = None, seed: int = 42,
                 *, initial=None, gravity=None, self_gravity: bool = False,
                 cooling: bool = False, forcing=None, mask=None,
                 mask_state=None, inflow_states=None,
                 isothermal_sound_speed: Optional[float] = None,
                 source_distribution=None, stellar_feedback: bool = False):
        geom = config.geometry
        cell = geom.cell_size
        if not np.allclose(cell, cell[0], rtol=1e-6):
            raise NotImplementedError("cubic cells required")
        self.config = config
        self.log = log or NullLog()
        self.key = jax.random.PRNGKey(seed)
        self.geometry = geom
        self.dx = float(cell[0])
        self.gravity = gravity
        self.self_gravity = bool(self_gravity)
        self.cooling = bool(cooling)
        self.forcing = forcing
        self.mask = mask
        self.mask_state = mask_state
        self.inflow_states = inflow_states
        self.isothermal_sound_speed = isothermal_sound_speed
        self.source_distribution = source_distribution
        self.stellar_feedback = bool(stellar_feedback)

        # initial conditions: DensityFields override, else background + blocks
        centers = geom.cell_centers()
        velocity = None
        if initial is not None:
            nd = np.asarray(initial.number_density, dtype=float)
            T = np.asarray(initial.temperature, dtype=float)
            if getattr(initial, "velocity", None) is not None:
                velocity = np.asarray(initial.velocity, dtype=float)
        else:
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
        if isothermal_sound_speed is not None:
            pressure = rho * isothermal_sound_speed**2
        w = hydro.Primitives(
            rho=jnp.asarray(rho, jnp.float32),
            vx=jnp.asarray(velocity[..., 0], jnp.float32)
            if velocity is not None else jnp.zeros(geom.shape, jnp.float32),
            vy=jnp.asarray(velocity[..., 1], jnp.float32)
            if velocity is not None else jnp.zeros(geom.shape, jnp.float32),
            vz=jnp.asarray(velocity[..., 2], jnp.float32)
            if velocity is not None else jnp.zeros(geom.shape, jnp.float32),
            p=jnp.asarray(pressure, jnp.float32),
        )
        self.state = hydro.conserved_from_primitives(w, config.gamma)
        if self.mask is not None and self.mask_state is None:
            self.mask_state = self.state  # hold the initial state
        self.neutral_fraction = jnp.full(
            geom.shape, config.initial_neutral_fraction, jnp.float32
        )
        self.time = 0.0
        self._source_gpos = tuple(
            float(g) for g in geom.position_to_grid_coords(config.source_position)
        )
        self._source_set_gpos = None  # evolving source positions (device)
        self._step_jit = jax.jit(self._step)
        self._chunk_jit = None  # lazily-built fused multi-step scan

    # ----------------------------------------------------------- from_params

    @classmethod
    def from_params(cls, params, log=None, seed: int = 42) -> "RHDSimulation":
        """Build the full driver from a parameter file — potentials,
        self-gravity, cooling, turbulence, masks, Bondi boundaries, and
        time-dependent sources included, mirroring
        /root/reference/src/RadiationHydrodynamicsSimulation.cpp:250-392."""
        import os

        from cmacionize_tpu.models.grid import GridGeometry
        from cmacionize_tpu.utils.params import ParameterFile

        geom = GridGeometry.from_params(params)
        total_time = params.get_physical_value(
            "RadiationHydrodynamicsSimulation:total time", "time", "0.141 Myr"
        )
        dt = params.get_physical_value(
            "RadiationHydrodynamicsSimulation:minimum timestep",
            "time",
            f"{total_time / 2048.0} s",
        )
        gamma = params.get_number(
            "HydroIntegrator:polytropic index", 5.0 / 3.0)

        # ---- initial conditions (any DensityFunction type)
        initial = None
        blocks = []
        dftype = params.get_string("DensityFunction:type", "Homogeneous")
        if dftype == "Homogeneous":
            block_file = params.get_string("DensityFunction:filename", "")
            if block_file and os.path.exists(block_file):
                block_params = ParameterFile(block_file)
                for i in range(block_params.get_int("number of blocks", 0)):
                    prefix = f"block[{i}]"
                    blocks.append(DensityBlock(
                        origin=tuple(block_params.get_physical_vector(
                            f"{prefix}:origin", "length")),
                        sides=tuple(block_params.get_physical_vector(
                            f"{prefix}:sides", "length")),
                        number_density=block_params.get_physical_value(
                            f"{prefix}:number density", "number density"),
                        temperature=block_params.get_physical_value(
                            f"{prefix}:initial temperature", "temperature",
                            "100. K"),
                    ))
        else:
            from cmacionize_tpu.models.density_functions import (
                density_function_from_params,
            )

            initial = density_function_from_params(params, geom)

        # ---- boundaries (periodic/reflective/inflow/outflow/bondi)
        bondi_profile = None

        def bc(name):
            value = params.get_string(
                f"HydroIntegrator:boundary {name}", "reflective")
            return {
                "periodic": hydro.BC_PERIODIC,
                "reflective": hydro.BC_REFLECTIVE,
                "inflow": hydro.BC_INFLOW,
                "outflow": hydro.BC_OUTFLOW,
                "bondi": hydro.BC_INFLOW,
            }[value], value == "bondi"

        bcs, bondi_flags = [], []
        for name in ("x low", "x high", "y low", "y high", "z low", "z high"):
            b, is_bondi = bc(name)
            bcs.append(b)
            bondi_flags.append(is_bondi)
        boundaries = tuple(
            (bcs[2 * a], bcs[2 * a + 1]) for a in range(3))

        inflow_states = None
        isothermal_sound_speed = None
        if any(bondi_flags) or params.has_value("BondiProfile:central mass"):
            from cmacionize_tpu.models.bondi import BondiProfile

            bondi_profile = BondiProfile(
                central_mass=params.get_physical_value(
                    "BondiProfile:central mass", "mass", "18. Msol"),
                bondi_density=params.get_physical_value(
                    "BondiProfile:Bondi density", "density", "1.e-19 g cm^-3"),
                sound_speed=params.get_physical_value(
                    "BondiProfile:sound speed", "velocity", "2.031 km s^-1"),
                center=tuple(params.get_physical_vector(
                    "BondiProfile:center", "length", ["0. m"] * 3)),
                ionisation_radius=params.get_physical_value(
                    "BondiProfile:ionisation radius", "length", "0. m"),
                pressure_contrast=params.get_number(
                    "BondiProfile:pressure contrast", 0.0),
            )
        if any(bondi_flags):
            # spatially-varying ghost primitives from the analytic profile
            # (BondiHydroBoundary.hpp) — evaluated once on the padded lattice
            n = geom.shape
            dxc = float(geom.cell_size[0])
            axes_1d = [
                geom.anchor[a] + (np.arange(-2, n[a] + 2) + 0.5) * dxc
                for a in range(3)
            ]
            padded_centers = np.stack(
                np.meshgrid(*axes_1d, indexing="ij"), axis=-1)
            p_rho, p_v, p_p, _ = bondi_profile.evaluate(padded_centers)
            padded_fields = (p_rho, p_v[..., 0], p_v[..., 1], p_v[..., 2], p_p)

            def ghost_slab(axis, side):
                sl = [slice(None)] * 3
                for a in range(axis + 1, 3):
                    sl[a] = slice(2, -2)
                sl[axis] = (slice(0, 2) if side == "lo"
                            else slice(n[axis] + 2, n[axis] + 4))
                return tuple(
                    jnp.asarray(f[tuple(sl)], jnp.float32)
                    for f in padded_fields
                )

            inflow_states = {
                (axis, side): ghost_slab(axis, side)
                for axis in range(3) for side in ("lo", "hi")
                if bondi_flags[2 * axis + (side == "hi")]
            }
        if gamma <= 1.001:
            # reference `polytropic index: 1.` → isothermal EOS
            cs = (bondi_profile.sound_speed if bondi_profile is not None
                  else float(np.sqrt(
                      constants.BOLTZMANN * params.get_physical_value(
                          "DensityFunction:temperature", "temperature",
                          "100. K") / constants.PROTON_MASS)))
            isothermal_sound_speed = cs
            gamma = 1.0 + 1e-6

        # ---- external potential + self-gravity
        gravity = None
        if params.get_bool(
                "RadiationHydrodynamicsSimulation:use potential", False):
            from cmacionize_tpu.ops import potentials

            ptype = params.get_string("ExternalPotential:type", "PointMass")
            if ptype == "PointMass":
                pot = potentials.PointMassPotential(
                    mass=params.get_physical_value(
                        "ExternalPotential:mass", "mass", "18. Msol"),
                    position=tuple(params.get_physical_vector(
                        "ExternalPotential:position", "length", ["0. m"] * 3)),
                    softening=float(geom.cell_size[0]),
                )
            elif ptype == "DiscPatch":
                pot = potentials.DiscPatchPotential(
                    surface_density=params.get_physical_value(
                        "ExternalPotential:surface density",
                        "surface density", "30. Msol pc^-2"),
                    disc_z=params.get_physical_value(
                        "ExternalPotential:disc z", "length", "0. m"),
                    scale_height=params.get_physical_value(
                        "ExternalPotential:scale height", "length", "100. pc"),
                )
            elif ptype == "CoredDMProfile":
                pot = potentials.CoredDMPotential(
                    central_density=params.get_physical_value(
                        "ExternalPotential:density at zero radius", "density",
                        "9.48e-19 g cm^-3"),
                    core_radius=params.get_physical_value(
                        "ExternalPotential:core radius", "length", "300. pc"),
                )
            else:
                raise ValueError(f"unknown ExternalPotential type {ptype!r}")
            acc = pot.acceleration(geom.cell_centers())
            gravity = tuple(
                jnp.asarray(acc[..., a], jnp.float32) for a in range(3))
        self_gravity = params.get_bool(
            "RadiationHydrodynamicsSimulation:use self gravity", False)
        cooling = params.get_bool(
            "RadiationHydrodynamicsSimulation:use cooling", False)

        # ---- hydro mask (BlockSyntax: freeze cells inside the blocks at
        # their initial state, cf. BlockSyntaxHydroMask.hpp)
        mask = None
        if params.get_bool(
                "RadiationHydrodynamicsSimulation:use mask", False):
            mtype = params.get_string("HydroMask:type", "BlockSyntax")
            if mtype != "BlockSyntax":
                raise NotImplementedError(
                    f"HydroMask type {mtype!r} not supported (BlockSyntax is)")
            from cmacionize_tpu.models.density_functions import (
                blocks_from_yaml,
            )

            mblocks = blocks_from_yaml(
                params.get_string("HydroMask:filename"))
            centers = geom.cell_centers()
            inside = np.zeros(geom.shape, bool)
            for blk in mblocks:
                inside |= np.asarray(blk.contains(centers))
            mask = jnp.asarray(inside)

        # ---- turbulence forcing (Alvelius)
        forcing = None
        if params.has_value("TurbulenceForcing:forcing power") or \
                params.get_bool(
                    "RadiationHydrodynamicsSimulation:use turbulent forcing",
                    False):
            from cmacionize_tpu.ops import turbulence

            forcing = turbulence.TurbulenceForcing.build(
                box_sides=float(geom.sides[0]),
                k_min=params.get_number(
                    "TurbulenceForcing:minimum wave number", 1.0),
                k_max=params.get_number(
                    "TurbulenceForcing:maximum wave number", 3.0),
                k_forcing=params.get_number(
                    "TurbulenceForcing:peak forcing wave number", 2.5),
                concentration_factor=params.get_number(
                    "TurbulenceForcing:concentration factor", 0.2),
                power_forcing=params.get_physical_value(
                    "TurbulenceForcing:forcing power", None, "2.717e-4 m^2 s^-3"),
                driving_timestep=dt,
            )

        # ---- time-dependent sources + stellar feedback
        source_distribution = None
        stellar_feedback = params.get_bool(
            "RadiationHydrodynamicsSimulation:use stellar feedback", False)
        sdtype = params.get_string("PhotonSourceDistribution:type", "SingleStar")
        if sdtype != "SingleStar" or stellar_feedback:
            from cmacionize_tpu.models.source_distributions import (
                source_distribution_from_params,
            )

            source_distribution = source_distribution_from_params(params)

        config = RHDConfig(
            geometry=geom,
            gamma=gamma,
            timestep=dt,
            total_time=total_time,
            luminosity=params.get_physical_value(
                "PhotonSourceDistribution:luminosity", "frequency",
                "1.e49 s^-1"),
            source_position=tuple(params.get_physical_vector(
                "PhotonSourceDistribution:position", "length", ["0. m"] * 3)),
            cross_section=params.get_physical_value(
                "CrossSections:hydrogen_0", "surface area", "6.3e-18 cm^2"),
            recombination_rate=params.get_physical_value(
                "RecombinationRates:hydrogen_1", "reaction rate",
                "2.7e-13 cm^3 s^-1"),
            n_photons=params.get_int(
                "RadiationHydrodynamicsSimulation:number of photons", 1000000),
            nloop=params.get_int(
                "RadiationHydrodynamicsSimulation:number of iterations", 10),
            background_density=params.get_physical_value(
                "DensityFunction:density", "number density", "0. m^-3"),
            background_temperature=params.get_physical_value(
                "DensityFunction:temperature", "temperature", "100. K"),
            blocks=blocks,
            boundaries=boundaries,
            radiative_heating=params.get_bool(
                "HydroIntegrator:radiative heating", True),
            radiative_cooling=params.get_bool(
                "HydroIntegrator:radiative cooling", False),
            riemann_solver=params.get_string(
                "HydroIntegrator:riemann solver type", "HLLC"),
        )
        return cls(
            config, log=log, seed=seed, initial=initial, gravity=gravity,
            self_gravity=self_gravity, cooling=cooling, forcing=forcing,
            mask=mask, inflow_states=inflow_states,
            isothermal_sound_speed=isothermal_sound_speed,
            source_distribution=source_distribution,
            stellar_feedback=stellar_feedback,
        )

    # ------------------------------------------------------------------ core

    def _radiation_update(self, key, number_density, neutral_fraction):
        """nloop MC ionization iterations on the current density field."""
        cfg = self.config
        shape = self.geometry.shape
        sigma_dx = cfg.cross_section * self.dx
        luminosity = cfg.luminosity
        if self.source_distribution is not None:
            sset = self.source_distribution.source_set()
            if len(sset.luminosities) == 0:
                return neutral_fraction  # no active sources → no radiation
            luminosity = sset.total_luminosity
        jfac_scale = (
            luminosity * cfg.cross_section * self.dx
            / (cfg.n_photons * self.geometry.cell_volume)
        )
        for loop in range(cfg.nloop):
            key, subkey = jax.random.split(key)
            chi = (number_density * neutral_fraction * sigma_dx).reshape(-1)
            if self.source_distribution is not None:
                px, py, pz, dx, dy, dz, tau, _, weight = (
                    sources.emit_source_set(
                        subkey, cfg.n_photons, sset, self.geometry
                    )
                )
            else:
                px, py, pz, dx, dy, dz, tau, _, weight = (
                    sources.emit_point_source(
                        subkey, cfg.n_photons, self._source_gpos
                    )
                )
            packets = traversal.make_packets(
                jnp.stack([px, py, pz], 1), jnp.stack([dx, dy, dz], 1),
                tau, weight, shape,
            )
            tally = jnp.zeros(chi.shape, chi.dtype)
            # plain blocked march (NOT the cascade): in the RHD radiation
            # loop the medium is mostly neutral — packets terminate within a
            # few cells, so the march ends after a handful of phases and the
            # cascade's compaction sorts are pure overhead (probed on the
            # 64³ starbench; the cascade only pays off on slowly-decaying
            # survival curves like converged stromgren)
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

    def _gravity_fields(self, u):
        """Total acceleration: static external + live FFT self-gravity."""
        g = self.gravity
        if self.self_gravity:
            from cmacionize_tpu.ops import potentials

            gs = potentials.fft_self_gravity(u.rho, (self.dx,) * 3)
            if g is None:
                g = gs
            else:
                g = tuple(a + b for a, b in zip(g, gs))
        return g

    def _step(self, key, u, neutral_fraction):
        cfg = self.config
        key_rad, key_force = jax.random.split(key)
        if cfg.nloop > 0 and (
            self.source_distribution is None
            or len(self.source_distribution.source_set().luminosities) > 0
        ):
            number_density = (
                hydro.primitives_from_conserved(u, cfg.gamma).rho
                / constants.PROTON_MASS
            )
            neutral_fraction = self._radiation_update(
                key_rad, number_density, neutral_fraction)
            u = self._two_temperature_coupling(u, neutral_fraction)
        gravity = self._gravity_fields(u)
        if self.cooling:
            from cmacionize_tpu.ops import derijcke

            u = derijcke.cooling_substep(u, cfg.timestep, cfg.gamma)
        if self.isothermal_sound_speed is not None:
            u = hydro.isothermal_hydro_step(
                u,
                cfg.timestep,
                sound_speed=self.isothermal_sound_speed,
                boundaries=cfg.boundaries,
                cell_size=(self.dx,) * 3,
                gravity=gravity,
                inflow_states=self.inflow_states,
            )
        else:
            u = hydro.hydro_step(
                u,
                cfg.timestep,
                boundaries=cfg.boundaries,
                cell_size=(self.dx,) * 3,
                gamma=cfg.gamma,
                riemann_solver=cfg.riemann_solver,
                gravity=gravity,
                inflow_states=self.inflow_states,
            )
        if self.forcing is not None:
            from cmacionize_tpu.ops import turbulence

            force = self.forcing.force_field(
                key_force, self._forcing_centers())
            u = turbulence.apply_forcing(u, force, cfg.timestep)
        if self.mask is not None:
            u = hydro.apply_hydro_mask(u, self.mask, self.mask_state)
        return u, neutral_fraction

    def _forcing_centers(self):
        if not hasattr(self, "_centers_cache"):
            self._centers_cache = jnp.asarray(
                self.geometry.cell_centers(), jnp.float32)
        return self._centers_cache

    # ------------------------------------------------------------------- run

    def run(
        self,
        n_steps: Optional[int] = None,
        log_every: int = 50,
        restart_manager=None,
        statistics=None,
        diagnostics=None,
    ):
        """Advance the simulation.

        ``restart_manager``: optional io.restart.RestartManager — checkpoints
        are written on its wall-clock cadence and on SIGINT (graceful stop,
        cf. the reference's RestartManager + Signals integration).
        ``statistics``: optional utils.statistics.StatisticsLogger.
        ``diagnostics``: optional utils.diagnostics.IterationDiagnostics —
        per-step counter/phase dumps (forces the per-step path so phases
        are measurable; cf. TaskBasedRadiationHydrodynamicsSimulation's
        per-step diagnostics output).
        """
        from cmacionize_tpu.utils import signals

        signals.install()
        cfg = self.config
        if n_steps is None:
            n_steps = int(round(cfg.total_time / cfg.timestep))

        # Fused fast path: with no per-step side effects, advance in
        # ``log_every``-sized lax.scan chunks — ONE dispatch per chunk
        # instead of one per step (the per-step host round trips dominate
        # the wall clock through the relay; RNG split chain identical to
        # the per-step loop, so results are bit-identical).
        if (
            self.source_distribution is None
            and restart_manager is None
            and statistics is None
            and diagnostics is None
            and n_steps >= 4
        ):
            chunk = max(1, min(log_every, 64))
            if self._chunk_jit is None:
                @functools.partial(jax.jit, static_argnames=("length",))
                def run_chunk(key, u, xh, length):
                    def body(carry, _):
                        key, u, xh = carry
                        key, sub = jax.random.split(key)
                        u, xh = self._step(sub, u, xh)
                        return (key, u, xh), None

                    (key, u, xh), _ = jax.lax.scan(
                        body, (key, u, xh), None, length=length)
                    return key, u, xh

                self._chunk_jit = run_chunk
            done = 0
            while done < n_steps and not signals.stop_requested():
                todo = min(chunk, n_steps - done)
                self.key, self.state, self.neutral_fraction = self._chunk_jit(
                    self.key, self.state, self.neutral_fraction, todo)
                done += todo
                self.time += todo * cfg.timestep
                w = hydro.primitives_from_conserved(self.state, cfg.gamma)
                self.log.info(
                    f"step {done}/{n_steps} t={self.time / 3.156e13:.4f} Myr "
                    f"max|v|={float(jnp.max(jnp.abs(w.vx))):.3g} m/s "
                    f"<xH>={float(jnp.mean(self.neutral_fraction)):.3f}"
                )
            if signals.stop_requested():
                self.log.warning("graceful stop requested; exiting time loop")
            return self.state, self.neutral_fraction

        for step in range(n_steps):
            if self.source_distribution is not None:
                # time-dependent population + SN stellar feedback
                # (RadiationHydrodynamicsSimulation.cpp:529-535)
                changed = self.source_distribution.update(self.time)
                if changed:
                    self._step_jit = jax.jit(self._step)  # source set rebaked
                if self.stellar_feedback:
                    from cmacionize_tpu.models.source_distributions import (
                        deposit_supernova_energy,
                    )

                    sne = self.source_distribution.pop_supernovae()
                    if sne:
                        # accumulate in f64 (1e44 J overflows f32) and add as
                        # an energy density
                        e_sn = getattr(
                            self.source_distribution, "energy", None)
                        kwargs = {} if e_sn is None else {
                            "energy_per_sn": float(e_sn)}
                        injected = deposit_supernova_energy(
                            np.zeros(self.geometry.shape, np.float64),
                            sne, self.geometry, **kwargs,
                        )
                        self.state = self.state._replace(
                            energy=self.state.energy + jnp.asarray(
                                injected / self.geometry.cell_volume,
                                self.state.energy.dtype,
                            )
                        )
                        self.log.info(
                            f"injected {len(sne)} supernova(e) at "
                            f"t={self.time:.3e} s")
            self.key, subkey = jax.random.split(self.key)
            if diagnostics is not None:
                with diagnostics.phase("step"):
                    self.state, self.neutral_fraction = self._step_jit(
                        subkey, self.state, self.neutral_fraction
                    )
                    jax.block_until_ready(self.state.rho)
                diagnostics.count("steps", 1)
                diagnostics.count(
                    "photons emitted", cfg.n_photons * cfg.nloop)
                diagnostics.end_iteration()
            else:
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
