import math

import pytest

from cmacionize_tpu.utils.params import ParameterFile
from cmacionize_tpu.utils.units import convert, parse_quantity


def test_basic_quantities():
    assert parse_quantity("100. cm^-3") == pytest.approx(1.0e8)
    assert parse_quantity("5. pc") == pytest.approx(5 * 3.086e16)
    assert parse_quantity("4.e-13 cm^3 s^-1") == pytest.approx(4.0e-19)
    assert parse_quantity("6.3e-18 cm^2") == pytest.approx(6.3e-22)
    assert parse_quantity("13.6 eV") == pytest.approx(13.6 * 1.6021766208e-19)
    assert parse_quantity("4.26e49 s^-1") == pytest.approx(4.26e49)
    assert parse_quantity("8000. K") == pytest.approx(8000.0)
    assert parse_quantity(42) == 42.0
    assert parse_quantity("2. g cm^-3") == pytest.approx(2000.0)


def test_dimension_check():
    assert parse_quantity("100. cm^-3", "number density") == pytest.approx(1e8)
    with pytest.raises(ValueError):
        parse_quantity("100. cm^-3", "length")


def test_convert():
    assert convert(1.0, "pc", "m") == pytest.approx(3.086e16)
    assert convert(1.0, "Myr", "s") == pytest.approx(365.25 * 86400 * 1e6)
    with pytest.raises(ValueError):
        convert(1.0, "pc", "s")


def test_parameter_file(tmp_path):
    param_text = """
SimulationBox:
  anchor: [-5. pc, -5. pc, -5. pc]
  sides: [10. pc, 10. pc, 10. pc]
  periodicity: [false, false, false]
DensityGrid:
  number of cells: [64, 64, 64]
DensityFunction:
  density: 100. cm^-3
IonizationSimulation:
  number of photons: 1e6
"""
    path = tmp_path / "test.param"
    path.write_text(param_text)
    params = ParameterFile(str(path))
    anchor = params.get_physical_vector("SimulationBox:anchor", "length")
    assert anchor[0] == pytest.approx(-5 * 3.086e16)
    assert params.get_int_vector("DensityGrid:number of cells") == [64, 64, 64]
    assert params.get_bool_vector("SimulationBox:periodicity") == [False] * 3
    assert params.get_int("IonizationSimulation:number of photons") == 1000000
    assert params.get_physical_value(
        "DensityFunction:density", "number density"
    ) == pytest.approx(1e8)
    # default + used-values recording
    assert params.get_int("IonizationSimulation:number of iterations", 20) == 20
    used = params.used_values()
    assert used["IonizationSimulation:number of iterations"] == 20
    out = tmp_path / "used.yml"
    params.write_used_values(str(out))
    assert "number of iterations" in out.read_text()
