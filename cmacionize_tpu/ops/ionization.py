"""Photoionization equilibrium solvers (vectorized over cells).

Physics follows the reference IonizationStateCalculator
(/root/reference/src/IonizationStateCalculator.cpp): mean-intensity tallies
are normalized by jfac = L_tot / (W_tot · V_cell) into per-neutral-atom
photoionization rates j_ion [s^-1], then the balance equations are solved per
cell.  All solvers here are pure elementwise jnp functions, safe for f32 on
TPU (the hydrogen solution is written in a cancellation-free form instead of
the reference's two-branch Taylor fallback,
/root/reference/src/IonizationStateCalculator.cpp:805-820).
"""

from __future__ import annotations

import jax.numpy as jnp

# lower floor on neutral fractions, cf.
# /root/reference/src/IonizationStateCalculator.cpp:810 (1e-14)
NEUTRAL_FRACTION_FLOOR = 1.0e-14


def hydrogen_neutral_fraction(jH, nH, alphaH):
    """Solve jH·x = αH·nH·(1-x)² for the neutral fraction x ∈ (0, 1].

    With C = αH·nH/jH the physical root of C·x² - (2C+1)·x + C = 0 is written
    via its conjugate (the two roots multiply to 1), which is numerically
    stable for both the highly ionized (C → 0) and neutral (C → ∞) limits —
    no cancellation, so f32 is sufficient.

    Cells with no ionizing radiation (jH <= 0) or no gas stay fully neutral.
    """
    jH = jnp.asarray(jH)
    safe_j = jnp.where(jH > 0.0, jH, 1.0)
    C = alphaH * nH / safe_j
    x = 2.0 * C / (2.0 * C + 1.0 + jnp.sqrt(4.0 * C + 1.0))
    x = jnp.maximum(x, NEUTRAL_FRACTION_FLOOR)
    return jnp.where((jH > 0.0) & (nH > 0.0), x, 1.0)


def normalize_mean_intensity(tally, luminosity, total_weight, cell_volume):
    """Raw path-length tally Σ ℓσw [m³] → photoionization rate [s^-1].

    jfac = L / (W_tot · V_cell), cf.
    /root/reference/src/IonizationStateCalculator.cpp:519,545.
    """
    return tally * (luminosity / (total_weight * cell_volume))
