"""Photon trackers and live outputs.

Equivalents of the reference's tracker subsystem
(/root/reference/src/TrackerFactory.hpp:65-72 — Absorption/Spectrum
trackers placed by a TrackerManager from a YAML file — and the
LiveOutputManager's surface-density / PDF reductions,
/root/reference/src/LiveOutputManager.hpp:29-56).

TPU-native design: the reference hooks a per-cell pointer into the tally hot
loop (/root/reference/src/DensitySubGrid.hpp:614-617); here the spectral
traversal already produces frequency-binned per-cell tallies, so a
"tracker" is just a gather of tracked-cell columns accumulated across
iterations — zero cost in the hot loop.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from cmacionize_tpu.models.grid import GridGeometry


class TrackerManager:
    """Accumulates per-cell spectra for tracked positions.

    Feed it the [n_bins * n_cell] spectral tally of each MC iteration
    (the multifreq driver's tally2d); `spectra()` returns the accumulated
    path-length spectrum Σ ℓ·w per frequency bin for each tracked cell —
    multiply by σ(ν)/V_cell·jfac for a mean-intensity spectrum.
    """

    def __init__(
        self,
        geometry: GridGeometry,
        positions: Sequence[Tuple[float, float, float]],
        bin_edges: np.ndarray,
    ):
        self.geometry = geometry
        self.bin_edges = np.asarray(bin_edges)
        self.positions = list(positions)
        shape = geometry.shape
        cells = []
        for position in positions:
            idx = np.clip(
                geometry.position_to_grid_coords(position).astype(int),
                0,
                np.asarray(shape) - 1,
            )
            cells.append((idx[0] * shape[1] + idx[1]) * shape[2] + idx[2])
        self.cell_indices = np.asarray(cells, dtype=np.int64)
        self._accumulated = np.zeros(
            (len(cells), len(self.bin_edges) - 1), dtype=np.float64
        )
        self.n_iterations = 0

    @classmethod
    def from_yaml(cls, geometry, filename, bin_edges):
        """Load tracker positions from a YAML file: a `positions:` list of
        unit-bearing coordinate triples (TrackerManager equivalent)."""
        import yaml

        from cmacionize_tpu.utils.units import parse_quantity

        with open(filename) as handle:
            doc = yaml.safe_load(handle)
        positions = [
            tuple(parse_quantity(component, "length") for component in entry)
            for entry in doc["positions"]
        ]
        return cls(geometry, positions, bin_edges)

    def accumulate(self, tally2d) -> None:
        n_cell = self.geometry.n_cells
        t2 = np.asarray(tally2d).reshape(-1, n_cell)
        self._accumulated += t2[:, self.cell_indices].T
        self.n_iterations += 1

    def spectra(self) -> np.ndarray:
        """[n_trackers, n_bins] accumulated path-length spectra."""
        return self._accumulated.copy()

    def write(self, filename: str) -> None:
        centers = 0.5 * (self.bin_edges[1:] + self.bin_edges[:-1])
        with open(filename, "w") as handle:
            handle.write("# frequency_Hz\t" + "\t".join(
                f"tracker_{i}" for i in range(len(self.cell_indices))
            ) + "\n")
            for b, nu in enumerate(centers):
                row = "\t".join(f"{self._accumulated[t, b]:.8e}"
                                for t in range(len(self.cell_indices)))
                handle.write(f"{nu:.8e}\t{row}\n")


# ------------------------------------------------------------- live outputs


def surface_density(field, axis: int = 2, cell_size: float = 1.0):
    """Column-integrated surface density map (SurfaceDensityCalculator)."""
    return jnp.sum(jnp.asarray(field), axis=axis) * cell_size


def field_pdf(field, bins: int = 64, log: bool = True):
    """Histogram PDF of a field (Density/VelocityPDFCalculator).

    Returns (bin_edges, counts)."""
    values = np.asarray(field).ravel()
    if log:
        values = np.log10(np.maximum(values, 1e-300))
    counts, edges = np.histogram(values, bins=bins)
    return edges, counts


@dataclasses.dataclass
class PhotonPacketStatistics:
    """Scatter/re-emission generation histogram
    (/root/reference/src/PhotonPacketStatistics.hpp)."""

    counts: Optional[np.ndarray] = None

    def record_generation(self, generation: int, n_packets: int, max_gen=16):
        if self.counts is None:
            self.counts = np.zeros(max_gen, dtype=np.int64)
        if generation < len(self.counts):
            self.counts[generation] += n_packets
