"""Golden-data tests for cross sections and recombination rates.

Reuses the reference's checked-in Fortran-validated fixtures
(/root/reference/test/verner_testdata.txt, verner_rec_testdata.txt) when the
reference mount is present, plus standalone spot checks so the suite still
guards the physics without the mount.
"""

import os

import numpy as np
import pytest

from cmacionize_tpu import constants
from cmacionize_tpu.models import ions
from cmacionize_tpu.ops import cross_sections, recombination

REF_TEST = "/root/reference/test"

# fixture column order (both files), cf. testVernerCrossSections.cpp:52-57
FIXTURE_IONS = [
    "H_n", "He_n", "C_p1", "C_p2", "N_n", "N_p1", "N_p2",
    "O_n", "O_p1", "Ne_n", "Ne_p1", "S_p1", "S_p2", "S_p3",
]


def _load_fixture(name):
    rows = []
    with open(os.path.join(REF_TEST, name)) as fh:
        for line in fh:
            if line.strip().startswith("#") or not line.strip():
                continue
            rows.append([float(v) for v in line.split()])
    return np.asarray(rows)


def test_hydrogen_cross_section_at_threshold():
    # sigma_H(13.6 eV) ~ 6.30e-22 m^2 (the canonical value)
    nu = 13.60 * constants.ELECTRONVOLT / constants.PLANCK
    sigma = cross_sections.ion_cross_section("H_n", np.asarray([nu * 1.0001]))
    assert sigma[0] == pytest.approx(6.30e-22, rel=0.02)
    # below threshold: zero
    sigma0 = cross_sections.ion_cross_section("H_n", np.asarray([nu * 0.99]))
    assert sigma0[0] == 0.0


def test_hydrogen_recombination_canonical():
    # alpha_B-ish value at 1e4 K from the Verner & Ferland fit: ~4.17e-13 cm³/s
    rate = float(recombination.recombination_rate("H_n", 1e4))
    assert rate == pytest.approx(4.17e-19, rel=0.03)


@pytest.mark.skipif(not os.path.isdir(REF_TEST), reason="reference not mounted")
def test_cross_sections_golden():
    data = _load_fixture("verner_testdata.txt")
    freqs = data[:, 0] * 13.6 * constants.ELECTRONVOLT / constants.PLANCK
    table = cross_sections.tabulate_cross_sections(freqs, FIXTURE_IONS)
    # fixture stores sigma in 1e-18 cm^2 = 1e-22 m^2
    expected = data[:, 1:].T * 1e-22
    np.testing.assert_allclose(table, expected, rtol=1e-8, atol=1e-40)


@pytest.mark.skipif(not os.path.isdir(REF_TEST), reason="reference not mounted")
def test_recombination_rates_golden():
    data = _load_fixture("verner_rec_testdata.txt")
    temps = data[:, 0]
    for i, name in enumerate(FIXTURE_IONS):
        got = np.asarray(
            [float(recombination.recombination_rate(name, T)) for T in temps]
        )
        # fixture stores rates in cm^3/s
        expected = data[:, 1 + i] * 1e-6
        np.testing.assert_allclose(got, expected, rtol=1e-5, err_msg=name)


def test_full_ion_table_shapes():
    freqs = np.linspace(3.3e15, 1.3e16, 100)
    table = cross_sections.tabulate_cross_sections(freqs)
    assert table.shape == (ions.NUMBER_OF_IONS, 100)
    assert np.all(table >= 0)
    rates = recombination.recombination_rates_all(np.asarray([8000.0, 1e4]))
    assert rates.shape == (ions.NUMBER_OF_IONS, 2)
    assert bool(np.all(np.asarray(rates) > 0))


@pytest.mark.skipif(not os.path.isdir(REF_TEST), reason="reference not mounted")
def test_line_cooling_golden():
    import jax

    jax.config.update("jax_enable_x64", True)
    from cmacionize_tpu.ops import line_cooling

    data = _load_fixture("linecool_testdata.txt")
    T = data[:, 0]
    ne = data[:, 1] * 1e6  # cm^-3 -> m^-3
    abundances = data[:, 2:15]
    expected = data[:, 15] * 1e-7  # erg/s -> W
    got = np.asarray(line_cooling.cooling_rate(T, ne, abundances))
    np.testing.assert_allclose(got, expected, rtol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_TEST), reason="reference not mounted")
def test_charge_transfer_golden():
    from cmacionize_tpu.ops import charge_transfer as ct

    # (stage, atom) -> ion name, cf. testChargeTransferRates.cpp:49-76
    ion_map = {
        (4, 6): "C_p2",
        (1, 7): "N_n", (2, 7): "N_n", (3, 7): "N_p1", (4, 7): "N_p2",
        (1, 8): "O_n", (2, 8): "O_n", (3, 8): "O_p1",
        (3, 10): "Ne_p1",
        (3, 16): "S_p1", (4, 16): "S_p2", (5, 16): "S_p3",
    }
    data = _load_fixture("KingdonFerland_testdata.txt")
    for stage, atom, T, rec, ion in data:
        key = (int(stage), int(atom))
        if key not in ion_map:
            continue
        name = ion_map[key]
        t4 = T * 1e-4
        if stage > 1:
            got = float(ct.recombination_rate_H(name, t4)) * 1e6  # -> cm^3/s
            assert got == pytest.approx(rec, rel=1e-6), (name, T, "rec")
        if stage < 5 and ion > 0:
            got = float(ct.ionization_rate_H(name, t4)) * 1e6
            assert got == pytest.approx(ion, rel=1e-6), (name, T, "ion")


@pytest.mark.skipif(not os.path.isdir(REF_TEST), reason="reference not mounted")
def test_balmer_jump_golden():
    import jax

    jax.config.update("jax_enable_x64", True)
    from cmacionize_tpu.ops import emissivity

    # bjump_testdata.txt: T, H_high, H_low, He_high, He_low
    # (in 1e-40 erg cm^3/s/Hz, the raw tabulated units before conversion)
    # fixture: T, then the 4 coefficients in 1e-20 erg cm^3 s^-1 A^-1
    # -> SI via 1e-20 * 1e-7 (erg) * 1e-6 (cm^3) = 1e-33
    # (cf. testEmissivityCalculator.cpp:59-77, tolerance 1e-3)
    data = _load_fixture("bjump_testdata.txt")
    T = data[:, 0]
    got = emissivity.balmer_jump_emission(T)
    for col, values in enumerate(got):
        np.testing.assert_allclose(
            np.asarray(values), data[:, 1 + col] * 1e-33, rtol=1e-3
        )


def test_emissivities_structure():
    import jax

    jax.config.update("jax_enable_x64", True)
    from cmacionize_tpu.models import ions as ions_mod
    from cmacionize_tpu.ops import emissivity

    shape = (6, 6, 6)
    nd = np.full(shape, 1e8)
    T = np.full(shape, 9000.0)
    xion = {name: np.full(shape, 0.1) for name in ions_mod.ION_NAMES}
    xion["H_n"] = np.full(shape, 1e-3)
    xion["He_n"] = np.full(shape, 1e-2)
    out = emissivity.calculate_emissivities(
        nd, T, xion, dict(ions_mod.DEFAULT_ABUNDANCES)
    )
    assert "HAlpha" in out and "OIII_5007" in out and "Bjump_high" in out
    for k, v in out.items():
        assert np.all(np.isfinite(np.asarray(v))), k
        assert np.all(np.asarray(v) >= 0), k
    # Halpha/Hbeta ratio ~ 2.87 (case B)
    ratio = float(np.asarray(out["HAlpha"])[0, 0, 0] / np.asarray(out["HBeta"])[0, 0, 0])
    assert ratio == pytest.approx(2.87 * (0.9) ** (-0.06), rel=0.05)
    # neutral cells emit nothing
    xion["H_n"] = np.full(shape, 0.9)
    out2 = emissivity.calculate_emissivities(
        nd, T, xion, dict(ions_mod.DEFAULT_ABUNDANCES)
    )
    assert float(np.asarray(out2["HAlpha"]).max()) == 0.0


def test_full_emission_line_list():
    """All 42 reference emission-line labels (EmissivityValues.hpp:38-79)
    are produced, and classic line-ratio physics holds."""
    import jax.numpy as jnp

    from cmacionize_tpu.ops import emissivity

    shape = (4,)
    nd = jnp.full(shape, 1e8)
    T = jnp.full(shape, 1e4)
    xion = {"H_n": jnp.full(shape, 1e-3), "He_n": jnp.full(shape, 1e-2)}
    from cmacionize_tpu.models import ions as ions_mod

    for name in ions_mod.ION_NAMES:
        if name not in xion:
            xion[name] = jnp.full(shape, 0.3)
    abund = {"He": 0.1, "C": 2.2e-4, "N": 4e-5, "O": 3.3e-4, "Ne": 5e-5,
             "S": 9e-6}
    out = emissivity.calculate_emissivities(nd, T, xion, abund)

    expected = {
        "HAlpha", "HBeta", "HII", "Bjump_low", "Bjump_high", "OI_6300",
        "OI_6364", "OII_3727", "OIII_5007", "OIII_4959", "OIII_4363",
        "OIII_52mu", "OIII_88mu", "NII_5755", "NII_6548", "NII_6584",
        "NeIII_3869", "NeIII_3968", "SII_6725", "SII_4072", "SIII_9405",
        "SIII_6312", "SIII_19mu", "SIII_33mu", "avg_T", "avg_T_count",
        "avg_nH_nHe", "avg_nH_nHe_count", "NeII_12mu", "NIII_57mu",
        "NeIII_15mu", "NII_122mu", "CII_158mu", "CII_2325", "CIII_1908",
        "OII_7325", "SIV_10mu", "HeI_5876", "Hrec_s", "WFC2_F439W",
        "WFC2_F555W", "WFC2_F675W",
    }
    missing = expected - {k.replace("Bjump_high", "Bjump_high") for k in out}
    assert not missing, f"missing lines: {missing}"

    # [OIII] 5007/4959: fixed by the A-value ratio, ≈ 2.98
    ratio = float(out["OIII_5007"][0] / out["OIII_4959"][0])
    assert ratio == pytest.approx(2.98, rel=0.15)
    # [NII] 6584/6548 likewise ≈ 2.95
    rat2 = float(out["NII_6584"][0] / out["NII_6548"][0])
    assert rat2 == pytest.approx(2.95, rel=0.15)
    # nebular >> auroral at 1e4 K, low density
    assert float(out["OIII_5007"][0]) > 10 * float(out["OIII_4363"][0])
    # filters include their constituent recombination lines
    assert float(out["WFC2_F675W"][0]) > float(out["HAlpha"][0])
    # average-T tally pair reproduces T
    assert float(out["avg_T"][0] / out["avg_T_count"][0]) == pytest.approx(1e4)
