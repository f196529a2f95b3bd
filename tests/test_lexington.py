"""Lexington HII20 end-to-end regression against published benchmark values.

Runs the actual benchmarks/lexingtonHII20.param configuration (BlockSyntax
cavity, Planck 20000 K source, full abundance set, temperature balance) at
reduced resolution/photon budget and checks the ionization/temperature
structure against the published benchmark solution bands of Wood, Mathis &
Ercolano (2004), figure 2 (the solution the reference's own
benchmarks/lexingtonHII20.py plots against):

* interior electron temperature ~6500-7500 K (HII20 is a cool nebula —
  a failed heating/cooling balance lands at 8000+ or at the 500 K floor);
* hydrogen highly ionized (x_H < 3e-3) through 1-2.5 pc;
* helium front inside the hydrogen front;
* O+ dominant over O0 in the ionized zone (the classic HII20 signature).

Anything stronger needs the reference's MC budget (1e6 photons x 20 iters
on 64^3) — this is the structure-level regression the unit goldens can't
provide.
"""

import dataclasses
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
jax.config.update("jax_enable_x64", True)

from cmacionize_tpu.models.multifreq_simulation import (  # noqa: E402
    MultiFreqConfig,
    MultiFreqIonizationSimulation,
)
from cmacionize_tpu.utils.params import ParameterFile  # noqa: E402

PC = 3.086e16
BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks")


@pytest.fixture(scope="module")
def hii20_result():
    # BlockSyntax filename is relative to the param file; restore cwd so
    # later tests in the session don't write into benchmarks/
    prev_cwd = os.getcwd()
    os.chdir(BENCH_DIR)
    try:
        return _compute_hii20()
    finally:
        os.chdir(prev_cwd)


def _compute_hii20():
    params = ParameterFile(os.path.join(BENCH_DIR, "lexingtonHII20.param"))
    config = MultiFreqConfig.from_params(params)
    config = dataclasses.replace(
        config,
        geometry=dataclasses.replace(config.geometry, shape=(16, 16, 16)),
        n_photons=50000,
        n_iterations=8,
        n_bins=64,
        n_reemission_rounds=4,
    )
    from cmacionize_tpu.models.density_functions import (
        density_function_from_params,
    )

    fields = density_function_from_params(params, config.geometry)
    sim = MultiFreqIonizationSimulation(
        config, seed=11, density=np.asarray(fields.number_density))
    xion, T = sim.run()
    geom = config.geometry
    r = np.sqrt((geom.cell_centers() ** 2).sum(-1))
    return {
        "r": r,
        "T": np.asarray(T),
        "xH": np.asarray(xion["H_n"]),
        "xHe": np.asarray(xion["He_n"]),
        "xO": np.asarray(xion["O_n"]),
        "xOp": np.asarray(xion["O_p1"]),
        "nd": np.asarray(fields.number_density),
    }


def _shell(res, r_lo, r_hi):
    return (res["r"] > r_lo * PC) & (res["r"] < r_hi * PC) & (res["nd"] > 0)


class TestLexingtonHII20:
    def test_interior_temperature_band(self, hii20_result):
        sel = _shell(hii20_result, 1.0, 2.0)
        T_in = float(hii20_result["T"][sel].mean())
        # Wood+2004 fig. 2: T rises from ~6600 K to ~7500 K over the nebula
        assert 6000.0 < T_in < 8300.0

    def test_hydrogen_highly_ionized_through_2p5_pc(self, hii20_result):
        sel = _shell(hii20_result, 1.0, 2.5)
        assert float(np.median(hii20_result["xH"][sel])) < 3e-3

    def test_helium_front_inside_hydrogen_front(self, hii20_result):
        vol_H = float((hii20_result["xH"] < 0.5).sum())
        vol_He = float((hii20_result["xHe"] < 0.5).sum())
        assert vol_He <= vol_H * 1.05

    def test_oxygen_singly_ionized_zone(self, hii20_result):
        sel = _shell(hii20_result, 1.0, 2.0)
        # storage convention (IonizationStateCalculator.cpp:323-510, and
        # ops/ionization.py metal_ion_fractions): slot "O_n" holds the O+
        # fraction, slot "O_p1" the O++ fraction
        x_op = hii20_result["xO"][sel]
        x_opp = hii20_result["xOp"][sel]
        # Wood+2004 HII20: O+ dominates throughout the nebula, and the cool
        # 20000 K star produces essentially no O++
        assert float(np.median(x_op)) > 0.9
        assert float(np.median(x_opp)) < 0.1

    def test_cavity_carries_no_density(self, hii20_result):
        inside = hii20_result["r"] < 0.8 * 3.0e16  # cavity radius 3e18 cm
        assert (hii20_result["nd"][inside] == 0).all()
