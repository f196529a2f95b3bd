"""Density functions: initial-condition generators for the grids.

Equivalents of the reference's DensityFunction family (factory at
/root/reference/src/DensityFunctionFactory.hpp:138-174).  A density function
maps cell centers to (number density, temperature, neutral fraction) fields;
implemented host-side in numpy since it runs once at setup.

Implemented: Homogeneous, BlockSyntax (nested cube/sphere primitives from a
YAML file, cf. BlockSyntaxDensityFunction.hpp), DiscPatch, Bondi (from
models.bondi), SpiralGalaxy.  Snapshot-based functions live in
cmacionize_tpu.io.gadget (grid_from_snapshot).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from cmacionize_tpu.models.grid import GridGeometry
from cmacionize_tpu.utils.units import parse_quantity


@dataclasses.dataclass(frozen=True)
class DensityFields:
    number_density: np.ndarray
    temperature: np.ndarray
    neutral_fraction: np.ndarray


def homogeneous(geometry: GridGeometry, number_density, temperature,
                neutral_fraction=1e-6) -> DensityFields:
    shape = geometry.shape
    return DensityFields(
        np.full(shape, number_density),
        np.full(shape, temperature),
        np.full(shape, neutral_fraction),
    )


@dataclasses.dataclass(frozen=True)
class Block:
    """One BlockSyntax primitive: a cube or sphere with constant values."""

    origin: Tuple[float, float, float]
    sides: Tuple[float, float, float]  # sphere: sides[0] = diameter
    kind: str  # "cube" | "sphere"
    number_density: float
    temperature: float
    neutral_fraction: float = 1e-6

    def contains(self, centers: np.ndarray) -> np.ndarray:
        rel = centers - np.asarray(self.origin)
        if self.kind == "sphere":
            return (rel**2).sum(-1) <= (0.5 * self.sides[0]) ** 2
        return np.all(np.abs(rel) <= 0.5 * np.asarray(self.sides), axis=-1)


def block_syntax(
    geometry: GridGeometry,
    blocks: Sequence[Block],
    background_density: float = 0.0,
    background_temperature: float = 100.0,
    background_neutral_fraction: float = 1.0,
) -> DensityFields:
    """Apply nested blocks in order (later blocks override earlier ones),
    cf. BlockSyntaxDensityFunction."""
    centers = geometry.cell_centers()
    nd = np.full(geometry.shape, background_density)
    T = np.full(geometry.shape, background_temperature)
    xh = np.full(geometry.shape, background_neutral_fraction)
    for block in blocks:
        inside = block.contains(centers)
        nd = np.where(inside, block.number_density, nd)
        T = np.where(inside, block.temperature, T)
        xh = np.where(inside, block.neutral_fraction, xh)
    return DensityFields(nd, T, xh)


def blocks_from_yaml(filename: str) -> List[Block]:
    """Parse a BlockSyntax YAML file (cf. benchmarks/starbench.yml)."""
    import yaml

    with open(filename) as handle:
        doc = yaml.safe_load(handle)
    blocks = []
    for i in range(int(doc["number of blocks"])):
        entry = doc[f"block[{i}]"]
        blocks.append(
            Block(
                origin=tuple(
                    parse_quantity(c, "length") for c in entry["origin"]
                ),
                sides=tuple(
                    parse_quantity(c, "length") for c in entry["sides"]
                ),
                kind=str(entry.get("type", "cube")),
                number_density=parse_quantity(
                    entry["number density"], "number density"
                ),
                temperature=parse_quantity(
                    entry.get("initial temperature", "100. K"), "temperature"
                ),
                neutral_fraction=float(entry.get("neutral fraction H", 1e-6)),
            )
        )
    return blocks


def disc_patch(
    geometry: GridGeometry,
    surface_density: float,
    scale_height: float,
    disc_z: float,
    temperature: float,
) -> DensityFields:
    """Vertical sech² disc in hydrostatic equilibrium with the DiscPatch
    potential (cf. DiscPatchDensityFunction)."""
    centers = geometry.cell_centers()
    z = centers[..., 2] - disc_z
    rho0 = surface_density / (2.0 * scale_height)
    from cmacionize_tpu import constants

    nd = rho0 / np.cosh(z / scale_height) ** 2 / constants.PROTON_MASS
    return DensityFields(
        nd, np.full(geometry.shape, temperature), np.ones(geometry.shape)
    )


def spiral_galaxy(
    geometry: GridGeometry,
    central_density: float,
    scale_radius: float,
    scale_height: float,
    temperature: float = 0.0,
    cutoff: Optional[float] = None,
) -> DensityFields:
    """Double-exponential galactic ISM disc
    (cf. SpiralGalaxyDensityFunction.hpp — n = n0 e^{-R/rI} e^{-|z|/hI},
    truncated at 15 kpc)."""
    centers = geometry.cell_centers()
    R = np.sqrt(centers[..., 0] ** 2 + centers[..., 1] ** 2)
    z = np.abs(centers[..., 2])
    cutoff = cutoff if cutoff is not None else 15.0 * 3.086e19
    nd = np.where(
        (R < cutoff) & (z < cutoff),
        central_density * np.exp(-R / scale_radius - z / scale_height),
        0.0,
    )
    return DensityFields(
        nd, np.full(geometry.shape, temperature), np.ones(geometry.shape)
    )
