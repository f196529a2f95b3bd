"""I/O tests: Gadget snapshot round-trip + restart checkpointing."""

import numpy as np
import pytest

from cmacionize_tpu.io.gadget import (
    grid_from_snapshot,
    read_gadget_snapshot,
    write_gadget_snapshot,
)
from cmacionize_tpu.io.restart import RestartManager
from cmacionize_tpu.models.grid import GridGeometry

PC = 3.086e16


def test_gadget_round_trip(tmp_path):
    geometry = GridGeometry(
        anchor=(-PC, -PC, -PC), sides=(2 * PC, 2 * PC, 2 * PC), shape=(8, 8, 8)
    )
    rng = np.random.default_rng(0)
    nd = rng.uniform(1e7, 1e8, geometry.shape)
    xh = rng.uniform(0, 1, geometry.shape)
    path = str(tmp_path / "snap_000.hdf5")
    write_gadget_snapshot(
        path, geometry,
        {"NumberDensity": nd, "NeutralFractionH": xh}, time=1.5e10,
    )

    box, coords, fields = read_gadget_snapshot(path)
    assert np.allclose(box, 2 * PC)
    assert coords.shape == (512, 3)
    # coordinates span the box (cell centers, anchor-relative)
    assert coords.min() == pytest.approx(PC / 8)
    assert coords.max() == pytest.approx(2 * PC - PC / 8)
    np.testing.assert_allclose(fields["NumberDensity"], nd.reshape(-1))
    np.testing.assert_allclose(fields["NeutralFractionH"], xh.reshape(-1))

    # reference-analysis-script compatibility: the layout stromgren.py reads
    import h5py

    with h5py.File(path, "r") as handle:
        assert "BoxSize" in handle["/Header"].attrs
        assert "Time" in handle["/Header"].attrs
        assert handle["/PartType0/Coordinates"].shape == (512, 3)

    # deposit back onto the same grid: exact (one particle per cell)
    grid = grid_from_snapshot(path, geometry, "NumberDensity")
    np.testing.assert_allclose(grid, nd)


def test_restart_round_trip(tmp_path):
    manager = RestartManager(str(tmp_path), interval_seconds=0.0, max_keep=2)
    assert manager.latest() is None
    arrays = {"xh": np.linspace(0, 1, 10), "T": np.full((4, 4), 8000.0)}
    scalars = {"time": 1.25, "step": 42}
    manager.write(arrays, scalars)
    manager.write(arrays, scalars)
    manager.write(arrays, scalars)  # prunes to 2
    assert len(manager._list()) == 2
    loaded_arrays, loaded_scalars = RestartManager.load(manager.latest())
    np.testing.assert_allclose(loaded_arrays["xh"], arrays["xh"])
    np.testing.assert_allclose(loaded_arrays["T"], arrays["T"])
    assert loaded_scalars == scalars
    assert manager.due()


def test_ascii_snapshot(tmp_path):
    from cmacionize_tpu.io.gadget import write_ascii_snapshot

    geometry = GridGeometry((0.0,) * 3, (8.0,) * 3, (4, 4, 4))
    path = tmp_path / "snap.txt"
    write_ascii_snapshot(
        str(path), geometry, {"NumberDensity": np.arange(64.0).reshape(4, 4, 4)}
    )
    data = np.loadtxt(path)
    assert data.shape == (64, 4)
    np.testing.assert_allclose(data[:, 3], np.arange(64.0))


def test_timer_and_timelogger(tmp_path):
    import time as _time

    from cmacionize_tpu.utils.timer import TimeLogger, Timer, peak_memory_bytes

    timer = Timer()
    _time.sleep(0.01)
    assert timer.value() >= 0.01
    timer.stop()

    logger = TimeLogger()
    with logger.scope("outer"):
        with logger.scope("inner"):
            _time.sleep(0.005)
    report = logger.report()
    assert "outer" in report and "  inner" in report
    logger.write(str(tmp_path / "time_log.txt"))
    assert (tmp_path / "time_log.txt").exists()
    assert peak_memory_bytes() > 1024**2
