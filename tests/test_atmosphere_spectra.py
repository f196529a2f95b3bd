"""Tabulated atmosphere spectrum reader tests (synthetic fixtures).

The reference's data tarballs are fetched at its configure time and are not
available here, so each reader is exercised against a synthetic table
written in the documented file format, with a Planck shape so the resampled
CDF can be validated against the analytic planck_spectrum.
"""

import os

import numpy as np
import pytest

from cmacionize_tpu import constants
from cmacionize_tpu.models import atmosphere_spectra as atm
from cmacionize_tpu.models.sources import planck_spectrum


T_STAR = 40000.0
NU_ION = 3.289e15


def _planck_flambda(lam_m):
    """B_λ(T) (arbitrary scale) for synthetic tables."""
    h, c, k = constants.PLANCK, constants.LIGHTSPEED, constants.BOLTZMANN
    x = h * c / (lam_m * k * T_STAR)
    return 1.0 / (lam_m ** 5 * np.expm1(np.clip(x, None, 500.0)))


def _reference_planck_cdf(nu_grid):
    ref = planck_spectrum(T_STAR)
    return np.interp(nu_grid, ref.frequencies, ref.cdf)


def _assert_cdf_close(spec, atol=0.02):
    np.testing.assert_allclose(
        spec.cdf, _reference_planck_cdf(spec.frequencies), atol=atol)


class TestWMBasic:
    def _write_fixture(self, path):
        # wavelengths bracketing [nu_ion, 4 nu_ion]: 170-1000 A
        lam_a = np.linspace(150.0, 1100.0, 400)
        nu = constants.LIGHTSPEED * 1.0e10 / lam_a
        # eddington flux H_nu ~ B_nu: convert B_λ·λ²/c (shape only)
        e_nu = _planck_flambda(lam_a * 1e-10) * (lam_a * 1e-10) ** 2
        lines = [
            "WM-basic model atmosphere", "T_eff = 40000 K", "",
            f"number of: {len(lam_a)}",
            "", "wavelength flux", "(A) (erg)", "",
        ]
        lines += [f"{l:.6e} {e:.6e}" for l, e in zip(lam_a, e_nu)]
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")

    def test_log_g_filename_token(self):
        # log10(g_cgs)=4.0 -> token 400
        assert atm._wmbasic_log_g_name(100.0) == "400"
        # log10(g_cgs)=3.61 -> round(18.05)*20 = 360
        assert atm._wmbasic_log_g_name(10 ** 3.61 / 100.0) == "360"

    def test_reads_and_resamples_planck_shape(self, tmp_path):
        fname = tmp_path / "sed_40000_400_0020.dat"
        self._write_fixture(fname)
        spec, total_flux = atm.wmbasic_spectrum(40000.0, 100.0, str(tmp_path))
        assert total_flux > 0.0
        assert spec.frequencies[0] == NU_ION
        assert spec.frequencies[-1] == 4.0 * NU_ION
        assert spec.cdf[0] == 0.0 and spec.cdf[-1] == 1.0
        _assert_cdf_close(spec)

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            atm.wmbasic_spectrum(33000.0, 100.0, str(tmp_path))


class TestCastelliKurucz:
    def _write_fixture(self, path):
        import h5py

        lam = np.geomspace(1.0e-8, 2.0e-7, 300)  # m
        Z = np.array([0.004, 0.02, 0.04])
        Teff = np.array([30000.0, 40000.0, 50000.0])
        g = np.array([100.0, 300.0, 1000.0])
        F = np.zeros((len(lam), len(Z), len(Teff), len(g)))
        for iT, T in enumerate(Teff):
            h, c, k = (constants.PLANCK, constants.LIGHTSPEED,
                       constants.BOLTZMANN)
            x = h * c / (lam * k * T)
            F[:, :, iT, :] = (1.0 / (lam ** 5 * np.expm1(x)))[:, None, None]
        with h5py.File(path, "w") as f:
            f["lambda"] = lam
            f["Z"] = Z
            f["Teff"] = Teff
            f["g"] = g
            f["Flambda"] = F

    def test_node_value_matches_planck(self, tmp_path):
        fname = str(tmp_path / "ck.hdf5")
        self._write_fixture(fname)
        spec = atm.castelli_kurucz_spectrum(40000.0, 300.0, 0.02, fname)
        _assert_cdf_close(spec)

    def test_interpolated_point_is_between_nodes(self, tmp_path):
        fname = str(tmp_path / "ck.hdf5")
        self._write_fixture(fname)
        s_mid = atm.castelli_kurucz_spectrum(35000.0, 200.0, 0.01, fname)
        assert s_mid.cdf[0] == 0.0 and s_mid.cdf[-1] == 1.0
        assert np.all(np.diff(s_mid.cdf) >= 0)

    def test_out_of_range_raises(self, tmp_path):
        fname = str(tmp_path / "ck.hdf5")
        self._write_fixture(fname)
        with pytest.raises(ValueError, match="outside tabulated range"):
            atm.castelli_kurucz_spectrum(99000.0, 300.0, 0.02, fname)


def _write_wavelength_table(path, skiprows):
    lam_a = np.linspace(150.0, 1100.0, 400)
    l_lam = _planck_flambda(lam_a * 1e-10)
    # the reference multiplies by λ[Å]² — shape-identical to λ[m]²
    with open(path, "w") as f:
        for _ in range(skiprows):
            f.write("# header\n")
        for l, e in zip(lam_a, l_lam):
            f.write(f"{l:.6e} {e:.6e}\n")


class TestPegase3:
    def test_index_lookup_and_planck_shape(self, tmp_path):
        (tmp_path / "pegase_chab.all").write_text(
            "spec_1 1000000.0 0.02\n"
            "spec_2 2000000.0 0.02\n"
            "spec_3 1000000.0 0.05\n")
        _write_wavelength_table(tmp_path / "spec_2", skiprows=2)
        spec = atm.pegase3_spectrum(2.0e6, 0.02, str(tmp_path))
        _assert_cdf_close(spec)

    def test_unknown_age_lists_valid_values(self, tmp_path):
        (tmp_path / "pegase_chab.all").write_text("spec_1 1000000.0 0.02\n")
        with pytest.raises(ValueError, match="valid ages"):
            atm.pegase3_spectrum(5.0e6, 0.02, str(tmp_path))


class TestPopStar:
    def test_filename_convention_and_shape(self, tmp_path):
        _write_wavelength_table(
            tmp_path / "spneb_cha_0.15_100_z0080_t6.50", skiprows=0)
        spec = atm.popstar_spectrum(6.5, 0.008, str(tmp_path))
        _assert_cdf_close(spec)


class TestFactory:
    def test_dispatch_wmbasic(self, tmp_path):
        from cmacionize_tpu.utils.params import ParameterFile

        TestWMBasic()._write_fixture(tmp_path / "sed_40000_400_0020.dat")
        yml = tmp_path / "p.yml"
        yml.write_text(
            "PhotonSourceSpectrum:\n"
            "  type: WMBasic\n"
            f"  data location: {tmp_path}\n"
            "  temperature: 40000. K\n"
            "  surface gravity: 100. m s^-2\n")
        spec = atm.atmosphere_spectrum_from_params(ParameterFile(str(yml)))
        _assert_cdf_close(spec)

    def test_dispatch_popstar(self, tmp_path):
        from cmacionize_tpu.utils.params import ParameterFile

        _write_wavelength_table(
            tmp_path / "spneb_cha_0.15_100_z0200_t6.00", skiprows=0)
        yml = tmp_path / "p.yml"
        yml.write_text(
            "PhotonSourceSpectrum:\n"
            "  type: PopStar\n"
            f"  data location: {tmp_path}\n"
            "  log age: 6.0\n"
            "  metallicity: 0.02\n")
        spec = atm.atmosphere_spectrum_from_params(ParameterFile(str(yml)))
        _assert_cdf_close(spec)

    def test_sampling_draws_in_band(self):
        import jax

        nu = np.linspace(NU_ION, 4 * NU_ION, 100)
        cdf = np.linspace(0.0, 1.0, 100)
        from cmacionize_tpu.models.sources import TabulatedSpectrum

        spec = TabulatedSpectrum(frequencies=nu, cdf=cdf)
        s = np.asarray(spec.sample(jax.random.PRNGKey(0), 1000))
        assert (s >= NU_ION).all() and (s <= 4 * NU_ION).all()


class TestMultifreqIntegration:
    def test_tabulated_spectrum_feeds_bin_pdf(self):
        """A WMBasic-style table plugged into the multifreq driver yields a
        normalized per-bin CDF consistent with the table."""
        import jax

        jax.config.update("jax_enable_x64", True)
        from cmacionize_tpu.models import ions
        from cmacionize_tpu.models.grid import GridGeometry
        from cmacionize_tpu.models.multifreq_simulation import (
            MultiFreqConfig,
            MultiFreqIonizationSimulation,
        )

        pc = 3.086e16
        nu = np.linspace(NU_ION, 4 * NU_ION, 200)
        cdf = (nu - nu[0]) / (nu[-1] - nu[0])
        config = MultiFreqConfig(
            geometry=GridGeometry(
                (-1.5 * pc,) * 3, (3 * pc,) * 3, (8, 8, 8)),
            number_density=1e8,
            initial_temperature=8000.0,
            source_position=(0.0, 0.0, 0.0),
            luminosity=1e49,
            spectrum_type="wmbasic",
            spectrum_temperature=40000.0,
            spectrum_frequency=3.3e15,
            n_photons=1000,
            n_iterations=1,
            abundances=dict(ions.DEFAULT_ABUNDANCES),
            do_temperature=False,
            n_bins=32,
            n_reemission_rounds=1,
            spectrum_table=(nu, cdf),
        )
        sim = MultiFreqIonizationSimulation(config, seed=0)
        assert sim.spectrum_cdf[0] == 0.0
        np.testing.assert_allclose(sim.spectrum_cdf[-1], 1.0, rtol=1e-12)
        # uniform table -> nearly uniform bin weights
        w = np.diff(sim.spectrum_cdf)
        assert w.max() / w.min() < 1.5
