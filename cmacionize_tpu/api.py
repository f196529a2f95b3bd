"""Library API: arrays in → neutral fractions out.

Equivalent of the reference's CMILibrary + SPHArrayInterface
(/root/reference/src/CMILibrary.hpp:46-70, SPHArrayInterface.cpp): a host
code (SPH, moving-mesh, …) hands over particle positions/smoothing
lengths/masses; the framework grids them, runs the photoionization
simulation, and maps the resulting neutral fractions back to the particles.

Mapping modes (cf. SPHArrayInterface.hpp:38-56):
    "m_over_v"  — nearest-cell mass deposition / cell volume
    "centroid"  — cloud-in-cell (trilinear) deposition
    "petkova"   — Petkova et al. (2018) exact kernel-overlap integrals
                  (native C++ path, cmacionize_tpu/native/sph_mapping.cpp)
All three conserve total mass exactly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from cmacionize_tpu import constants
from cmacionize_tpu.models.grid import GridGeometry
from cmacionize_tpu.models.ionization_simulation import (
    HOnlyConfig,
    HOnlyIonizationSimulation,
)


def _deposit_m_over_v(geometry, positions, masses):
    # prefer the native C++ kernel (cmacionize_tpu/native) when built
    from cmacionize_tpu import native

    grid = native.deposit_m_over_v(
        positions, masses,
        np.asarray(geometry.anchor), np.asarray(geometry.sides),
        np.asarray(geometry.shape),
    )
    if grid is not None:
        return grid
    shape = np.asarray(geometry.shape)
    cell = geometry.cell_size
    idx = ((positions - np.asarray(geometry.anchor)) / cell).astype(int)
    idx = np.clip(idx, 0, shape - 1)
    grid = np.zeros(geometry.shape)
    np.add.at(grid, tuple(idx.T), masses)
    return grid / geometry.cell_volume


def _deposit_cic(geometry, positions, masses):
    shape = np.asarray(geometry.shape)
    cell = geometry.cell_size
    frac = (positions - np.asarray(geometry.anchor)) / cell - 0.5
    base = np.floor(frac).astype(int)
    t = frac - base
    grid = np.zeros(geometry.shape)
    for ox in (0, 1):
        for oy in (0, 1):
            for oz in (0, 1):
                w = (
                    (t[:, 0] if ox else 1 - t[:, 0])
                    * (t[:, 1] if oy else 1 - t[:, 1])
                    * (t[:, 2] if oz else 1 - t[:, 2])
                )
                idx = np.clip(base + [ox, oy, oz], 0, shape - 1)
                np.add.at(grid, tuple(idx.T), masses * w)
    return grid / geometry.cell_volume


def _deposit_petkova(geometry, positions, masses, smoothing_lengths):
    """Exact kernel-overlap deposition (SPHArrayInterface.cpp:739-930).

    Prefers the native analytic path; falls back to a sub-sampled numeric
    kernel integration (3^3 points per cell) that converges to the same map.

    Incoming ``smoothing_lengths`` use the SPH convention (kernel support =
    h); the reference halves them before evaluating its support-2h cubic
    spline (SPHArrayInterface.cpp:986), and so do we.
    """
    from cmacionize_tpu import native

    smoothing_lengths = np.asarray(smoothing_lengths) * 0.5
    grid = native.petkova_deposit(
        positions, masses, smoothing_lengths,
        np.asarray(geometry.anchor), np.asarray(geometry.sides),
        np.asarray(geometry.shape), normalize=True,
    )
    if grid is not None:
        return grid
    # numpy fallback: numeric sub-cell quadrature of the cubic spline
    shape = np.asarray(geometry.shape)
    cell = geometry.cell_size
    grid = np.zeros(geometry.shape)
    offs = (np.arange(3) + 0.5) / 3.0
    sub = np.stack(np.meshgrid(offs, offs, offs, indexing="ij"),
                   -1).reshape(-1, 3)
    for p, m, h in zip(positions, masses, smoothing_lengths):
        lo = np.maximum(((p - 2 * h - geometry.anchor) // cell), 0).astype(int)
        hi = np.minimum(((p + 2 * h - geometry.anchor) // cell),
                        shape - 1).astype(int)
        ix, iy, iz = [np.arange(lo[a], hi[a] + 1) for a in range(3)]
        if not (len(ix) and len(iy) and len(iz)):
            continue
        cells = np.stack(np.meshgrid(ix, iy, iz, indexing="ij"),
                         -1).reshape(-1, 3)
        pts = (geometry.anchor + (cells[:, None] + sub[None]) * cell)
        q = np.linalg.norm(pts - p, axis=-1) / h
        w = np.where(
            q < 1.0, 1.0 - 1.5 * q * q * (1.0 - 0.5 * q),
            np.where(q < 2.0, 0.25 * (2.0 - q) ** 3, 0.0),
        ) / (np.pi * h ** 3)
        frac = w.mean(axis=1) * geometry.cell_volume
        tot = frac.sum()
        if tot > 0:
            np.add.at(grid, tuple(cells.T), m * frac / tot)
    return grid / geometry.cell_volume


def _sample_grid(geometry, grid, positions):
    """Nearest-cell sampling of a grid field at particle positions
    (the inverse mapping, cf. SPHArrayInterface fill_array)."""
    shape = np.asarray(geometry.shape)
    idx = ((positions - np.asarray(geometry.anchor)) / geometry.cell_size).astype(int)
    idx = np.clip(idx, 0, shape - 1)
    return grid[tuple(idx.T)]


def compute_neutral_fraction(
    positions: np.ndarray,  # [N, 3] SI
    masses: np.ndarray,  # [N] kg
    box_anchor: Tuple[float, float, float],
    box_sides: Tuple[float, float, float],
    n_cells: Tuple[int, int, int] = (64, 64, 64),
    *,
    source_position: Tuple[float, float, float] = (0.0, 0.0, 0.0),
    luminosity: float = 4.26e49,
    cross_section: float = 6.3e-22,
    recombination_rate: float = 4e-19,
    temperature: float = 8000.0,
    n_photons: int = 1000000,
    n_iterations: int = 10,
    mapping: str = "m_over_v",
    smoothing_lengths: Optional[np.ndarray] = None,  # [N] m, for "petkova"
    periodic: bool = False,
    seed: int = 42,
) -> np.ndarray:
    """Grid the particles, run the MC ionization simulation, map back.

    The cmi_compute_neutral_fraction_* equivalent
    (/root/reference/src/CMILibrary.cpp:46-95): returns the per-particle
    hydrogen neutral fraction.
    """
    positions = np.ascontiguousarray(positions, np.float64)
    masses = np.ascontiguousarray(masses, np.float64)
    geometry = GridGeometry(
        anchor=tuple(box_anchor),
        sides=tuple(box_sides),
        shape=tuple(n_cells),
        periodic=(periodic,) * 3,
    )
    if mapping == "petkova":
        if smoothing_lengths is None:
            # reasonable default: mean interparticle spacing
            spacing = (np.prod(box_sides) / max(len(masses), 1)) ** (1.0 / 3.0)
            smoothing_lengths = np.full(len(masses), spacing)
        density = _deposit_petkova(
            geometry, positions, masses,
            np.ascontiguousarray(smoothing_lengths, np.float64))
    else:
        deposit = {
            "m_over_v": _deposit_m_over_v, "centroid": _deposit_cic
        }[mapping]
        density = deposit(geometry, positions, masses)  # kg m^-3
    number_density = density / constants.PROTON_MASS

    config = HOnlyConfig(
        geometry=geometry,
        number_density=float(number_density.mean()),
        temperature=temperature,
        source_position=source_position,
        luminosity=luminosity,
        cross_section=cross_section,
        recombination_rate=recombination_rate,
        n_photons=n_photons,
        n_iterations=n_iterations,
    )
    sim = HOnlyIonizationSimulation(config, seed=seed)
    # replace the homogeneous density with the gridded particle field
    import jax.numpy as jnp

    sim.number_density = jnp.asarray(number_density, jnp.float32)
    xh_grid = np.asarray(sim.run())
    return _sample_grid(geometry, xh_grid, positions)
