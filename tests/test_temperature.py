"""Golden-data tests for the cooling/heating balance and temperature solve.

Reuses the reference's Fortran-validated fixtures
(/root/reference/test/ioneng_testdata.txt, tbal_testdata.txt) with the
protocol of testTemperatureCalculator.cpp.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
jax.config.update("jax_enable_x64", True)

from cmacionize_tpu.models import ions  # noqa: E402
from cmacionize_tpu.ops import temperature  # noqa: E402

REF_TEST = "/root/reference/test"

# lexington abundances used by the fixture generator
# (testTemperatureCalculator.cpp:81)
ABUND = {"He": 0.1, "C": 2.2e-4, "N": 4.0e-5, "O": 3.3e-4, "Ne": 5.0e-5, "S": 9.0e-6}

METALS = tuple(ions.ION_NAMES[2:])


def _load(name):
    rows = []
    with open(os.path.join(REF_TEST, name)) as fh:
        for line in fh:
            if line.strip() and not line.strip().startswith("#"):
                rows.append([float(v) for v in line.split()])
    return np.asarray(rows)


pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_TEST), reason="reference not mounted"
)


def test_cooling_heating_balance_golden():
    data = _load("ioneng_testdata.txt")
    j = {name: data[:, i] for i, name in enumerate(ions.ION_NAMES)}
    hH = data[:, 14] * 1e-7  # erg/s -> W
    hHe = data[:, 15] * 1e-7
    T = data[:, 16]
    gain_exp = data[:, 17] * 0.1 * 1e-20  # erg cm^-3 s^-1 (x1e20) -> SI
    loss_exp = data[:, 18] * 0.1 * 1e-20
    n = data[:, 19] * 1e6  # cm^-3 -> m^-3
    h0_exp = data[:, 20]
    he0_exp = data[:, 21]
    metal_exp = {name: data[:, 22 + i] for i, name in enumerate(METALS)}

    bal = temperature.cooling_heating_balance(
        T, j, (hH, hHe), n, ABUND, pahfac=1.0, crfac=0.0
    )
    np.testing.assert_allclose(np.asarray(bal.h0), h0_exp, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(bal.he0), he0_exp, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(bal.gain), gain_exp, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(bal.loss), loss_exp, rtol=1e-3)
    for name in METALS:
        np.testing.assert_allclose(
            np.asarray(bal.metals[name]), metal_exp[name],
            rtol=1e-3, atol=1e-12, err_msg=name,
        )


def test_temperature_solve_golden():
    data = _load("tbal_testdata.txt")
    mask = data[:, 16] <= 30000.0  # skip high-T lines like the reference test
    data = data[mask]
    j = {name: data[:, i] for i, name in enumerate(ions.ION_NAMES)}
    hH = data[:, 14] * 1e-7
    hHe = data[:, 15] * 1e-7
    T_init = data[:, 16]
    n = data[:, 17] * 1e6
    h0_exp = np.minimum(data[:, 18], 1.0)
    he0_exp = data[:, 19]
    T_exp = np.minimum(data[:, 32], 30000.0)

    T, h0, he0, metals = temperature.solve_temperature(
        T_init, j, (hH, hHe), n, ABUND, pahfac=1.0, crfac=0.0
    )
    # iterative solves accumulate roundoff; reference test uses 1e-4,
    # we allow slightly more because the iteration strategy differs
    np.testing.assert_allclose(np.asarray(T), T_exp, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(h0), h0_exp, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(he0), he0_exp, rtol=2e-3)


def test_compacted_solve_bitwise_identical():
    """solve_temperature_compacted must reproduce the jitted lockstep solve
    bitwise (the secant state tuple is resumable on any cell subset —
    staging changes cost, not results).

    The reference is the JITTED full solve: that is what the production
    driver dispatches, and eager-vs-jit XLA compilations of the same loop
    legitimately differ in the last ulp (which the branchy secant can
    amplify for a few cells — measured 81/3000 cells differ between the
    two compilations while both satisfy the same convergence criterion)."""
    import functools

    import jax
    rng = np.random.default_rng(11)
    n_cells = 40000  # above the small-problem fallback threshold
    # a realistic mix: mostly-ionized cells, a neutral tail, a spread of
    # heating strengths — produces a skewed trip-count distribution
    jH = 10.0 ** rng.uniform(-14, -6, n_cells)
    scale = {"H_n": 1.0, "He_n": 0.7}
    j = {
        name: jH * scale.get(name, 10.0 ** rng.uniform(-3, 0))
        for name in ions.ION_NAMES
    }
    hH = jH * 10.0 ** rng.uniform(-19.0, -18.0, n_cells)
    h = (hH, 0.5 * hH)
    nd = 10.0 ** rng.uniform(6, 10, n_cells)
    T_init = 10.0 ** rng.uniform(2.0, 4.3, n_cells)

    ref_fn = jax.jit(functools.partial(
        temperature.solve_temperature, pahfac=1.0, crfac=0.0))
    ref = ref_fn(T_init, j, h, nd, ABUND)
    got = temperature.solve_temperature_compacted(
        T_init, j, h, nd, ABUND, pahfac=1.0, crfac=0.0,
        stage1_iterations=1)
    # the staging must actually have happened for this to test anything
    stats = temperature.LAST_COMPACTED_STATS
    assert stats["compactions"] > 0, stats
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(ref[2]))
    for name in METALS:
        np.testing.assert_array_equal(
            np.asarray(got[3][name]), np.asarray(ref[3][name]),
            err_msg=name,
        )
