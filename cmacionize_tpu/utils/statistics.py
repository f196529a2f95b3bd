"""Global conservation statistics for RHD runs.

Equivalent of /root/reference/src/StatisticsLogger.hpp: per-step totals of
mass, momentum and energy (plus extrema) appended to a text log, used to
monitor conservation in long RHD runs.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


class StatisticsLogger:
    def __init__(self, filename: Optional[str] = "statistics.txt"):
        self._handle = open(filename, "w") if filename else None
        if self._handle:
            self._handle.write(
                "# time\tmass\tmom_x\tmom_y\tmom_z\tenergy\trho_min\trho_max\n"
            )
        self.history = []

    def log(self, time: float, state, cell_volume: float) -> dict:
        """state: a HydroState pytree of per-volume conserved fields."""
        row = {
            "time": float(time),
            "mass": float(jnp.sum(state.rho)) * cell_volume,
            "mom_x": float(jnp.sum(state.mom_x)) * cell_volume,
            "mom_y": float(jnp.sum(state.mom_y)) * cell_volume,
            "mom_z": float(jnp.sum(state.mom_z)) * cell_volume,
            "energy": float(jnp.sum(state.energy)) * cell_volume,
            "rho_min": float(jnp.min(state.rho)),
            "rho_max": float(jnp.max(state.rho)),
        }
        self.history.append(row)
        if self._handle:
            self._handle.write(
                "\t".join(f"{row[k]:.10e}" for k in (
                    "time", "mass", "mom_x", "mom_y", "mom_z", "energy",
                    "rho_min", "rho_max",
                ))
                + "\n"
            )
            self._handle.flush()
        return row
