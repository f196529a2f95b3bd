"""stromgren_diffuse acceptance: physical re-emission vs the analytic bands.

The reference's stromgren_diffuse benchmark
(/root/reference/benchmarks/stromgren_diffuse.param) turns the physical
DiffuseReemissionHandler on.  Analytically, Case-A recombination with
transported diffuse photons produces an ionized region BETWEEN the Case-A
Strömgren sphere (every recombination consumes an ionizing photon — lower
bound) and the Case-B sphere (ground-state recombinations fully returned to
the field — upper bound, the on-the-spot limit).  This pins the re-emission
channel tree end-to-end in a way the per-channel unit tests cannot.
"""

import dataclasses

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


def _run(diffuse, n=16, seed=5):
    box = 10.0 * PC
    config = MultiFreqConfig(
        geometry=GridGeometry((-box / 2,) * 3, (box,) * 3, (n, n, n)),
        number_density=1.0e8,
        initial_temperature=8000.0,
        source_position=(0.0, 0.0, 0.0),
        luminosity=4.26e49,
        spectrum_type="monochromatic",
        spectrum_temperature=40000.0,
        spectrum_frequency=3.2899e15,
        n_photons=50000,
        n_iterations=8,
        abundances=dict(ions.DEFAULT_ABUNDANCES),
        do_temperature=False,
        diffuse_field=diffuse,
        n_bins=64,
        n_reemission_rounds=6 if diffuse else 0,
    )
    sim = MultiFreqIonizationSimulation(config, seed=seed)
    xion, _ = sim.run()
    xh = np.asarray(xion["H_n"])
    cell_volume = config.geometry.cell_volume
    return float(((1.0 - xh) * cell_volume).sum())


def test_diffuse_field_between_case_a_and_case_b():
    nH = 1.0e8
    L = 4.26e49
    T = 8000.0
    from cmacionize_tpu.ops import recombination

    alpha_A = float(recombination.recombination_rate("H_n", T))
    # Case-B: subtract the ground-state (n=1) recombination coefficient;
    # alpha_1 ~ 0.38 alpha_A at 8000 K (Osterbrock tab. 2.1)
    alpha_B = alpha_A * 0.62
    v_case_a = L / (alpha_A * nH * nH)
    v_case_b = L / (alpha_B * nH * nH)

    v_off = _run(diffuse=False)
    v_on = _run(diffuse=True)

    # measured at 16^3 (front smearing adds ~+13% volume at this
    # resolution, cf. the convergence study in test_amr):
    # v_off/v_caseA = 1.13, v_on/v_caseB = 1.06, v_on/v_off = 1.51
    # (analytic alpha_A/alpha_B = 1.61)
    # without re-emission every recombination destroys a photon: Case A
    assert v_off == pytest.approx(v_case_a, rel=0.2)
    # with transported diffuse photons the region grows toward Case B —
    # a broken channel tree would land outside [1.2, 1.7]
    assert 1.2 * v_off < v_on < 1.7 * v_off
    assert v_on == pytest.approx(v_case_b, rel=0.2)
