"""CLI and library-API tests (the reference's L11 surface)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_dry_run(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, "-m", "cmacionize_tpu", "--params",
         os.path.join(REPO, "benchmarks", "stromgren.param"), "--dry"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True, timeout=120,
    )
    assert result.returncode == 0, result.stderr


def test_cli_mini_ionization_run(tmp_path):
    param_text = """
SimulationBox:
  anchor: [-5. pc, -5. pc, -5. pc]
  sides: [10. pc, 10. pc, 10. pc]
DensityGrid:
  number of cells: [12, 12, 12]
DensityFunction:
  density: 100. cm^-3
  temperature: 8000. K
PhotonSourceDistribution:
  luminosity: 4.26e49 s^-1
IonizationSimulation:
  number of photons: 5000
  number of iterations: 3
CrossSections:
  hydrogen_0: 6.3e-18 cm^2
RecombinationRates:
  hydrogen_1: 4.e-13 cm^3 s^-1
DensityGridWriter:
  prefix: mini_
"""
    param_file = tmp_path / "mini.param"
    param_file.write_text(param_text)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [sys.executable, "-m", "cmacionize_tpu", "--params", str(param_file)],
        env=env, cwd=str(tmp_path), capture_output=True, text=True, timeout=300,
    )
    assert result.returncode == 0, result.stderr
    snap = tmp_path / "mini_000.hdf5"
    assert snap.exists()
    used = tmp_path / "mini.param.used-values"
    assert used.exists()

    from cmacionize_tpu.io.gadget import read_gadget_snapshot

    _, coords, fields = read_gadget_snapshot(str(snap))
    assert coords.shape == (12**3, 3)
    xh = fields["NeutralFractionH"]
    assert xh.min() < 1e-3  # ionized interior
    assert xh.max() > 0.9  # neutral corners


def test_library_api_stromgren():
    # particles uniformly filling the box -> same physics as the homogeneous
    # stromgren setup; check per-particle neutral fractions by radius
    pc = 3.086e16
    rng = np.random.default_rng(1)
    n_part = 20000
    positions = rng.uniform(-5 * pc, 5 * pc, (n_part, 3))
    box_volume = (10 * pc) ** 3
    target_nd = 1e8
    m_p = 1.672621898e-27
    masses = np.full(n_part, target_nd * box_volume * m_p / n_part)

    from cmacionize_tpu.api import compute_neutral_fraction

    xh = compute_neutral_fraction(
        positions, masses,
        (-5 * pc,) * 3, (10 * pc,) * 3, (16, 16, 16),
        n_photons=20000, n_iterations=5, seed=2,
    )
    assert xh.shape == (n_part,)
    r = np.sqrt((positions**2).sum(1))
    inner = xh[r < 2 * pc]
    outer = xh[r > 4.8 * pc]
    assert np.median(inner) < 1e-3
    assert np.median(outer) > 0.5
