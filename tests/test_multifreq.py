"""Integration tests for the multi-element (spectral) simulation driver."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
jax.config.update("jax_enable_x64", True)

from cmacionize_tpu.models import ions  # noqa: E402
from cmacionize_tpu.models.grid import GridGeometry  # noqa: E402
from cmacionize_tpu.models.multifreq_simulation import (  # noqa: E402
    MultiFreqConfig,
    MultiFreqIonizationSimulation,
)

PC = 3.086e16


def _config(**overrides):
    base = dict(
        geometry=GridGeometry(
            anchor=(-1.5 * PC,) * 3, sides=(3 * PC,) * 3, shape=(16, 16, 16)
        ),
        number_density=1e8,
        initial_temperature=8000.0,
        source_position=(0.0, 0.0, 0.0),
        luminosity=1e49,
        spectrum_type="planck",
        spectrum_temperature=40000.0,
        spectrum_frequency=3.3e15,
        n_photons=20000,
        n_iterations=6,
        abundances=dict(ions.DEFAULT_ABUNDANCES),
        do_temperature=True,
        minimum_iteration_number=2,
        diffuse_field=True,
        n_bins=64,
        n_reemission_rounds=3,
    )
    base.update(overrides)
    return MultiFreqConfig(**base)


def test_mini_lexington_runs_and_heats():
    sim = MultiFreqIonizationSimulation(_config(), seed=3)
    xion, T = sim.run()
    T = np.asarray(T)
    xH = np.asarray(xion["H_n"])
    # center cell: ionized HII region at ~10^4 K
    assert xH[8, 8, 8] < 0.1
    assert 5000.0 < T[8, 8, 8] < 25000.0
    # helium also ionized near the center for a 40 kK blackbody
    assert float(np.asarray(xion["He_n"])[8, 8, 8]) < 0.5
    # metal stage fractions are finite and within [0, 1]
    for name in ("N_n", "O_n", "S_p1", "C_p1", "Ne_p1"):
        vals = np.asarray(xion[name])
        assert np.all(np.isfinite(vals))
        assert np.all(vals >= 0.0) and np.all(vals <= 1.0 + 1e-9)


def test_monochromatic_matches_h_only_driver():
    # with a 13.6 eV monochromatic spectrum, zero He abundance and no
    # temperature calculation, the multifreq driver must reproduce the
    # dedicated H-only driver's Stromgren structure
    abund = dict(ions.DEFAULT_ABUNDANCES)
    abund["He"] = 0.0
    config = _config(
        spectrum_type="monochromatic",
        abundances=abund,
        do_temperature=False,
        diffuse_field=False,
        n_iterations=6,
        luminosity=2e49,
    )
    sim = MultiFreqIonizationSimulation(config, seed=11)
    xion, _ = sim.run()
    xH = np.asarray(xion["H_n"])

    from cmacionize_tpu.models.ionization_simulation import (
        HOnlyConfig,
        HOnlyIonizationSimulation,
    )
    from cmacionize_tpu.ops import cross_sections, recombination

    sigma = float(
        cross_sections.ion_cross_section(
            "H_n", np.asarray([float(sim.bin_centers[0])])
        )[0]
    )
    h_only = HOnlyIonizationSimulation(
        HOnlyConfig(
            geometry=config.geometry,
            number_density=config.number_density,
            temperature=config.initial_temperature,
            source_position=config.source_position,
            luminosity=config.luminosity,
            cross_section=sigma,
            recombination_rate=float(
                recombination.recombination_rate("H_n", config.initial_temperature)
            ),
            n_photons=config.n_photons,
            n_iterations=config.n_iterations,
        ),
        seed=11,
    )
    xH_ref = np.asarray(h_only.run())
    # same ionized-region size (within MC noise)
    v1 = (xH < 0.5).sum()
    v2 = (xH_ref < 0.5).sum()
    assert v1 == pytest.approx(v2, rel=0.2)
