"""CMacIonize-TPU: a TPU-native Monte Carlo photoionization + RHD framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of CMacIonize
(bwvdnbro/CMacIonize): Monte Carlo radiative transfer of ionizing photons
through density grids, photoionization/thermal balance, and finite-volume
radiation hydrodynamics — built for TPU hardware:

- photon packets live in fixed-shape batched arrays and are advanced in
  lockstep supersteps (replacing the reference's task-based scheduler,
  cf. /root/reference/src/TaskBasedIonizationSimulation.cpp);
- cell state is a struct-of-arrays pytree sharded over a `jax.sharding.Mesh`
  (replacing DensitySubGrid tiling + MPI, cf.
  /root/reference/src/DensitySubGridCreator.hpp);
- tallies are deterministic scatter-adds; collectives (psum/ppermute) replace
  MPI reductions and the designed-but-unfinished distributed subgrid exchange.

Package layout:
    utils/     config (YAML + physical units), logging, timers, restart
    ops/       compute kernels: photon traversal, ionization & temperature
               solvers, line cooling, Riemann solvers, hydro stencils
    models/    grid state, density functions, sources & spectra, simulation
               drivers (ionization, RHD, dust, emissivity)
    parallel/  device mesh, photon-parallel and domain-decomposed drivers
    io/        Gadget-layout HDF5 snapshots, snapshot readers, restart files
"""

__version__ = "0.1.0"

import os as _os

# Honor JAX_PLATFORMS even when the interpreter environment pre-imports jax
# (e.g. a sitecustomize that registers an accelerator plugin before user
# code runs, which makes the env var a no-op).  This restores the standard
# JAX platform-selection contract for CLI subprocesses and tests.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # jax missing or backends already initialized
        pass

from cmacionize_tpu import constants  # noqa: F401
