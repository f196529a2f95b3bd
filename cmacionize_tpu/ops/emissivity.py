"""Line-emissivity post-processing.

Equivalent of the reference's EmissivityCalculator
(/root/reference/src/EmissivityCalculator.cpp) and
EmissivityCalculationSimulation: given a converged ionization structure,
compute per-cell emissivities (J m^-3 s^-1):

- H recombination lines Hα, Hβ and the HeI 5876 line from Storey & Hummer /
  Osterbrock fits (EmissivityCalculator.cpp:103-140)
- the Balmer-jump continuum emission on both sides of 3646 Å from the
  tabulated Brown & Mathews values (:30-75)
- all collisionally-excited metal lines from the level-population solve
  (via cmacionize_tpu.ops.line_cooling.line_strengths)

Everything is vectorized over cells; the reference's per-cell `h0max = 0.2`
and T > 3000 K emission gate is applied as a mask.
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from cmacionize_tpu import constants
from cmacionize_tpu.ops import line_cooling

# Brown & Mathews Balmer-jump emission coefficients
# (1e-40 erg cm^3 s^-1 Hz^-1 at the tabulated temperatures), cf.
# EmissivityCalculator.cpp:20-28
_BJUMP_T = np.array([4e3, 6e3, 8e3, 1e4, 1.2e4, 1.4e4, 1.6e4, 1.8e4])
_BJUMP_H_HIGH = np.array([0.162, 0.584, 1.046, 1.437, 1.742, 1.977, 2.159, 2.297])
_BJUMP_H_LOW = np.array([92.6, 50.9, 33.8, 24.8, 19.53, 16.09, 13.7, 11.96])
_BJUMP_HE_HIGH = np.array([0.189, 0.622, 1.076, 1.45, 1.74, 1.963, 2.14, 2.27])
_BJUMP_HE_LOW = np.array([15.7, 9.23, 6.71, 5.49, 4.83, 4.41, 4.135, 3.94])

# five-level transition index order (LineCoolingData.hpp:87-113):
# 0: 0→1, 1: 0→2, 2: 0→3, 3: 0→4, 4: 1→2, 5: 1→3, 6: 1→4, 7: 2→3,
# 8: 2→4, 9: 3→4
T01, T02, T03, T04, T12, T13, T14, T23, T24, T34 = range(10)

#: full collisionally-excited line list: label → (coolant, (transitions…)),
#: the complete mapping of EmissivityCalculator.cpp:246-454 /
#: EmissivityValues.hpp:38-79 (each strength sums the listed transitions).
METAL_LINES = {
    "NII_5755": ("NII", (T34,)),
    "NII_6548": ("NII", (T13,)),
    "NII_6584": ("NII", (T23,)),
    "NII_122mu": ("NII", (T12,)),
    "OI_6300": ("OI", (T03,)),
    "OI_6364": ("OI", (T13,)),
    "OII_3727": ("OII", (T01, T02)),
    "OII_7325": ("OII", (T14, T24, T13, T23)),
    "OIII_4363": ("OIII", (T34,)),
    "OIII_4959": ("OIII", (T13,)),
    "OIII_5007": ("OIII", (T23,)),
    "OIII_52mu": ("OIII", (T12,)),
    "OIII_88mu": ("OIII", (T01,)),
    "NeIII_3869": ("NeIII", (T03,)),
    "NeIII_3968": ("NeIII", (T13,)),
    "NeIII_15mu": ("NeIII", (T01,)),
    "SII_4072": ("SII", (T03, T04)),
    "SII_6725": ("SII", (T01, T02)),
    "SIII_9405": ("SIII", (T13, T23)),
    "SIII_6312": ("SIII", (T34,)),
    "SIII_19mu": ("SIII", (T12,)),
    "SIII_33mu": ("SIII", (T01,)),
    "CII_158mu": ("CII", (T01,)),
    "CII_2325": ("CII", (T02, T12, T03, T13, T04, T14)),
    "CIII_1908": ("CIII", (T01, T02, T03)),
    # two-level coolants (single transition)
    "NIII_57mu": ("NIII", (0,)),
    "NeII_12mu": ("NeII", (0,)),
    "SIV_10mu": ("SIV", (0,)),
}


def _loglog_interp(T, table):
    logt = jnp.log(jnp.asarray(T))
    logtab = jnp.log(jnp.asarray(_BJUMP_T))
    logv = jnp.log(jnp.asarray(table))
    i = jnp.clip(jnp.searchsorted(logtab, logt) - 1, 0, 6)
    frac = (logt - logtab[i]) / (logtab[i + 1] - logtab[i])
    return jnp.exp(logv[i] + frac * (logv[i + 1] - logv[i]))


def balmer_jump_emission(T):
    """Continuum emission coefficients above/below the Balmer jump
    (J m^3 s^-1 Å^-1), for H and He: returns (H_high, H_low, He_high, He_low)."""
    conv_high = 1e-43 * constants.LIGHTSPEED / 3681.0**2
    conv_low = 1e-43 * constants.LIGHTSPEED / 3643.0**2
    return (
        _loglog_interp(T, _BJUMP_H_HIGH) * conv_high,
        _loglog_interp(T, _BJUMP_H_LOW) * conv_low,
        _loglog_interp(T, _BJUMP_HE_HIGH) * conv_high,
        _loglog_interp(T, _BJUMP_HE_LOW) * conv_low,
    )


def calculate_emissivities(
    number_density,
    temperature,
    xion: Dict[str, jnp.ndarray],
    abundances: Dict[str, float],
    h0max: float = 0.2,
) -> Dict[str, jnp.ndarray]:
    """Per-cell emissivities (J m^-3 s^-1) for the recombination lines,
    Balmer jump and collisionally-excited lines.

    ``xion`` uses the framework's stage-fraction storage convention (see
    ionization.metal_ion_fractions).
    """
    ntot = jnp.asarray(number_density)
    T = jnp.asarray(temperature)
    xH = xion["H_n"]
    xHe = xion["He_n"]
    AHe = abundances.get("He", 0.0)

    nhp = ntot * (1.0 - xH)
    nhep = ntot * (1.0 - xHe) * AHe
    ne = nhp + nhep
    T4 = T * 1e-4

    # emission gate (EmissivityCalculator.cpp:84-86)
    emitting = (xH < h0max) & (T > 3000.0)

    out = {}
    out["HAlpha"] = ne * nhp * 2.87 * 1.24e-38 * T4 ** (-0.938)
    out["HBeta"] = ne * nhp * 1.24e-38 * T4 ** (-0.878)
    out["HII"] = ne * nhp * 4.9e-40 * T4 ** (-0.848)
    out["HeI_5876"] = ne * nhep * 1.69e-38 * T4 ** (-1.065)

    bj_h_high, bj_h_low, bj_he_high, bj_he_low = balmer_jump_emission(T)
    out["Bjump_high"] = ne * (nhp * bj_h_high + nhep * bj_he_high)
    out["Bjump_low"] = ne * (nhp * bj_h_low + nhep * bj_he_low)

    # Lyman-continuum recombination photon rate, Verner & Ferland (1996)
    # case-B fit (EmissivityCalculator.cpp:405-410)
    sq1 = jnp.sqrt(T / 3.148)
    sq2 = jnp.sqrt(T / 7.036e5)
    out["Hrec_s"] = ne * nhp * 7.982e-23 / (
        sq1 * (1.0 + sq1) ** 0.252 * (1.0 + sq2) ** 1.748)

    # tally helpers for density-weighted averages
    # (EmissivityCalculator.cpp:387-397)
    out["avg_T"] = ne * nhp * T
    out["avg_T_count"] = ne * nhp
    # reference stores ne·(1 − x(He_n)) and ne·(1 − x(H_n)) — electron
    # density times ionized *fraction*, no extra density/abundance weights
    # (EmissivityCalculator.cpp:389-397)
    out["avg_nH_nHe"] = ne * (1.0 - xHe)
    out["avg_nH_nHe_count"] = ne * (1.0 - xH)

    # collisionally excited lines
    from cmacionize_tpu.ops.temperature import coolant_abundances

    metals = {k: v for k, v in xion.items() if k not in ("H_n", "He_n")}
    abund = coolant_abundances(xH, metals, abundances)
    five, two = line_cooling.line_strengths(T, ne, abund)

    def strength(coolant, transitions):
        if coolant in line_cooling.FIVE_NAMES:
            idx = line_cooling.FIVE_NAMES.index(coolant)
            return sum(five[..., idx, t] for t in transitions)
        idx = line_cooling.TWO_NAMES.index(coolant)
        return two[..., idx]

    for label, (coolant, transitions) in METAL_LINES.items():
        out[label] = ntot * strength(coolant, transitions)

    # HST WFPC2 broadband filters: sums of the lines inside each passband
    # (EmissivityCalculator.cpp:412-454)
    out["WFC2_F439W"] = ntot * (
        strength("OIII", (T34,)) + strength("SIII", (T03, T04)))
    out["WFC2_F555W"] = out["HBeta"] + ntot * (
        strength("NI", (T01, T02)) + strength("NII", (T34,))
        + strength("OI", (T34,)) + strength("OIII", (T03, T13, T23)))
    out["WFC2_F675W"] = out["HAlpha"] + ntot * (
        strength("NII", (T03, T13, T23)) + strength("OI", (T03, T13, T23))
        + strength("SII", (T01, T02)) + strength("SIII", (T34,)))

    return {k: jnp.where(emitting, v, 0.0) for k, v in out.items()}


def emissivity_post_processing(snapshot_in, snapshot_out, abundances=None):
    """EmissivityCalculationSimulation equivalent: read a snapshot, compute
    emissivities, write them back (cf.
    /root/reference/src/EmissivityCalculationSimulation.cpp)."""
    import h5py

    from cmacionize_tpu.models import ions as ions_mod

    abundances = abundances or dict(ions_mod.DEFAULT_ABUNDANCES)
    with h5py.File(snapshot_in, "r") as handle:
        parts = handle["PartType0"]
        nd = np.asarray(parts["NumberDensity"])
        T = np.asarray(parts["Temperature"])
        xion = {}
        for name in ions_mod.ION_NAMES:
            key = f"NeutralFraction{name}" if name not in ("H_n",) else "NeutralFractionH"
            if name == "He_n":
                key = "NeutralFractionHe"
            xion[name] = (
                np.asarray(parts[key]) if key in parts else np.zeros_like(nd)
            )
    emis = calculate_emissivities(nd, T, xion, abundances)
    if os.path.abspath(snapshot_in) != os.path.abspath(snapshot_out):
        import shutil

        shutil.copy(snapshot_in, snapshot_out)
    with h5py.File(snapshot_out, "a") as handle:
        for label, values in emis.items():
            handle["PartType0"].create_dataset(
                f"Emissivity{label}", data=np.asarray(values)
            )
    return emis
