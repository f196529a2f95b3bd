"""Native C++ SPH mapping kernels vs the numpy reference implementations."""

import numpy as np
import pytest

from cmacionize_tpu import native

pytestmark = pytest.mark.skipif(
    native.load() is None, reason="native library unavailable (no g++)"
)

PC = 3.086e16


def test_native_m_over_v_matches_numpy():
    rng = np.random.default_rng(0)
    n = 5000
    positions = rng.uniform(-PC, PC, (n, 3))
    masses = rng.uniform(1.0, 2.0, n)
    anchor = np.array([-PC] * 3)
    sides = np.array([2 * PC] * 3)
    dims = np.array([8, 8, 8])

    grid = native.deposit_m_over_v(positions, masses, anchor, sides, dims)

    cell_volume = np.prod(sides / dims)
    idx = ((positions - anchor) / (sides / dims)).astype(int)
    idx = np.clip(idx, 0, dims - 1)
    expected = np.zeros(tuple(dims))
    np.add.at(expected, tuple(idx.T), masses)
    expected /= cell_volume
    np.testing.assert_allclose(grid, expected, rtol=1e-12)
    # exact mass conservation
    assert grid.sum() * cell_volume == pytest.approx(masses.sum(), rel=1e-12)


def test_native_sph_kernel_conserves_mass():
    rng = np.random.default_rng(1)
    n = 2000
    positions = rng.uniform(-0.7 * PC, 0.7 * PC, (n, 3))
    masses = rng.uniform(1.0, 2.0, n)
    h = np.full(n, 0.15 * PC)
    anchor = np.array([-PC] * 3)
    sides = np.array([2 * PC] * 3)
    dims = np.array([16, 16, 16])
    grid = native.deposit_sph_kernel(positions, masses, h, anchor, sides, dims)
    cell_volume = np.prod(sides / dims)
    assert grid.sum() * cell_volume == pytest.approx(masses.sum(), rel=1e-10)
    # smoother than NGP: no empty cells inside the particle cloud
    inner = grid[6:10, 6:10, 6:10]
    assert inner.min() > 0


def test_native_sample_grid():
    grid = np.arange(4 * 4 * 4, dtype=np.float64).reshape(4, 4, 4)
    anchor = np.zeros(3)
    sides = np.array([4.0, 4.0, 4.0])
    positions = np.array([[0.5, 0.5, 0.5], [3.5, 3.5, 3.5], [1.5, 0.5, 2.5]])
    out = native.sample_grid(grid, anchor, sides, positions)
    np.testing.assert_allclose(out, [grid[0, 0, 0], grid[3, 3, 3], grid[1, 0, 2]])


def test_cmi_c_library_end_to_end(tmp_path):
    """Compile a C host program against the CMILibrary-compatible shim
    (libcmi_tpu.so embeds CPython → cmacionize_tpu.cmi) and run the full
    init → compute → destroy cycle — the counterpart of the reference's
    test/testCMICLibrary.c."""
    import os
    import subprocess
    import sys

    so = native.build_cmi()
    if so is None:
        pytest.skip("no C toolchain / python embedding flags")

    (tmp_path / "mini.param").write_text(
        "SimulationBox:\n"
        "  anchor: [0. m, 0. m, 0. m]\n"
        "  sides: [1.e17 m, 1.e17 m, 1.e17 m]\n"
        "DensityGrid:\n"
        "  number of cells: [12, 12, 12]\n"
        "DensityFunction:\n"
        "  density: 100. cm^-3\n"
        "PhotonSourceDistribution:\n"
        "  position: [5.e16 m, 5.e16 m, 5.e16 m]\n"
        "  luminosity: 1.e47 s^-1\n"
        "IonizationSimulation:\n"
        "  number of photons: 8000\n"
        "  number of iterations: 4\n"
    )
    driver = tmp_path / "driver.c"
    driver.write_text(r"""
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include "cmi_c_library.h"

int main(void) {
  const size_t N = 1000;
  double *x = malloc(N * sizeof(double)), *y = malloc(N * sizeof(double));
  double *z = malloc(N * sizeof(double)), *h = malloc(N * sizeof(double));
  double *m = malloc(N * sizeof(double)), *nH = malloc(N * sizeof(double));
  double anchor[3] = {0., 0., 0.};
  double sides[3] = {1.e17, 1.e17, 1.e17};
  /* 100 cm^-3 of hydrogen over the box, split over N equal particles */
  const double mpart = 1.e8 * 1.6726219e-27 * 1.e51 / (double)N;
  size_t i;
  srand(42);
  for (i = 0; i < N; ++i) {
    x[i] = 1.e17 * (rand() / (RAND_MAX + 1.));
    y[i] = 1.e17 * (rand() / (RAND_MAX + 1.));
    z[i] = 1.e17 * (rand() / (RAND_MAX + 1.));
    h[i] = 5.e15;
    m[i] = mpart;
  }
  cmi_init_periodic_dp("mini.param", 1, 1., 1., anchor, sides, "M over V", 0);
  cmi_compute_neutral_fraction_dp(x, y, z, h, m, nH, N);
  cmi_destroy();
  {
    int n_ion = 0, n_neut = 0;
    for (i = 0; i < N; ++i) {
      if (!(nH[i] >= 0. && nH[i] <= 1.)) {
        fprintf(stderr, "nH[%zu] = %g out of range\n", i, nH[i]);
        return 1;
      }
      if (nH[i] < 0.5) ++n_ion; else ++n_neut;
    }
    printf("ionized %d neutral %d\n", n_ion, n_neut);
    if (n_ion == 0 || n_neut == 0) {
      fprintf(stderr, "expected a partially ionized box\n");
      return 2;
    }
  }
  return 0;
}
""")
    here = os.path.dirname(os.path.abspath(native.__file__))
    includes = subprocess.run(
        ["python3-config", "--includes"],
        check=True, capture_output=True, text=True).stdout.split()
    ldflags = subprocess.run(
        ["python3-config", "--ldflags", "--embed"],
        check=True, capture_output=True, text=True).stdout.split()
    subprocess.run(
        ["gcc", "-O2", str(driver), "-I", here, "-L", here, "-lcmi_tpu",
         f"-Wl,-rpath,{here}"] + includes + ldflags
        + ["-o", str(tmp_path / "driver")],
        check=True, capture_output=True)
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(here))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    result = subprocess.run(
        [str(tmp_path / "driver")], cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600)
    assert result.returncode == 0, result.stderr + result.stdout
    assert "ionized" in result.stdout
