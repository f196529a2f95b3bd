"""Snapshot readers: synthetic FLASH / Amun / ascii files round-tripped."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from cmacionize_tpu.io.snapshots import (
    HYDROGEN_MASS,
    read_amun_snapshot,
    read_ascii_snapshot,
    read_flash_snapshot,
)


def _write_flash(path):
    """2-root-block domain (x), one block refined once: 9 blocks total,
    leaf = [root1 coarse] + [8 children of root0]."""
    nb = 4  # cells per block side
    # domain [0,2]x[0,1]x[0,1] cm, nblockx=2
    blocks = []
    # root block 0 (refined, NOT a leaf): children cover [0,1]^3
    blocks.append(dict(bb=[[0, 1], [0, 1], [0, 1]], level=1, ntype=2, rho=0.0))
    # root block 1 (leaf, coarse)
    blocks.append(dict(bb=[[1, 2], [0, 1], [0, 1]], level=1, ntype=1, rho=2.0))
    # 8 children of root 0 at level 2
    for cz in range(2):
        for cy in range(2):
            for cx in range(2):
                blocks.append(dict(
                    bb=[[cx * 0.5, (cx + 1) * 0.5],
                        [cy * 0.5, (cy + 1) * 0.5],
                        [cz * 0.5, (cz + 1) * 0.5]],
                    level=2, ntype=1, rho=1.0 + cx))

    n = len(blocks)
    bbox = np.array([b["bb"] for b in blocks], dtype=float)
    dens = np.stack([np.full((nb, nb, nb), b["rho"]) for b in blocks])
    temp = np.stack([np.full((nb, nb, nb), 100.0 * b["level"])
                     for b in blocks])
    rl = np.array([b["level"] for b in blocks], dtype=np.int32)
    nt = np.array([b["ntype"] for b in blocks], dtype=np.int32)

    str_dt = h5py.string_dtype(length=80)
    real_dt = np.dtype([("name", str_dt), ("value", np.float64)])
    int_dt = np.dtype([("name", str_dt), ("value", np.int32)])
    real_pars = np.array(
        [("xmin", 0.0), ("xmax", 2.0), ("ymin", 0.0), ("ymax", 1.0),
         ("zmin", 0.0), ("zmax", 1.0)], dtype=real_dt)
    int_pars = np.array(
        [("nblockx", 2), ("nblocky", 1), ("nblockz", 1)], dtype=int_dt)

    with h5py.File(path, "w") as f:
        f.create_dataset("real runtime parameters", data=real_pars)
        f.create_dataset("integer runtime parameters", data=int_pars)
        f.create_dataset("bounding box", data=bbox)
        f.create_dataset("dens", data=dens)
        f.create_dataset("temp", data=temp)
        f.create_dataset("refine level", data=rl)
        f.create_dataset("node type", data=nt)


def test_read_flash_snapshot(tmp_path):
    path = str(tmp_path / "flash.h5")
    _write_flash(path)
    snap = read_flash_snapshot(path)
    # finest resolution: nblock*(4 cells)*2^(2-1) = (16, 8, 8)
    assert snap.shape == (16, 8, 8)
    np.testing.assert_allclose(snap.anchor, [0.0, 0.0, 0.0])
    np.testing.assert_allclose(snap.sides, [0.02, 0.01, 0.01])
    # left half: children with rho = 1+cx (g/cm^3 → number density)
    unit = 1e3 / HYDROGEN_MASS
    np.testing.assert_allclose(snap.number_density[0, 0, 0], 1.0 * unit)
    np.testing.assert_allclose(snap.number_density[7, 0, 0], 2.0 * unit)
    # right half: coarse root block, upsampled ×2
    np.testing.assert_allclose(snap.number_density[8:, :, :], 2.0 * unit)
    # temperatures carried through (children at level 2 → 200 K)
    np.testing.assert_allclose(snap.temperature[0, 0, 0], 200.0)
    np.testing.assert_allclose(snap.temperature[12, 4, 4], 100.0)


def test_read_amun_snapshot(tmp_path):
    dims = np.array([4, 4, 4])
    pdims = np.array([2, 1, 1])  # 2 files along x
    rng = np.random.default_rng(0)
    for ifile in range(2):
        with h5py.File(tmp_path / f"amun_{ifile:05d}.h5", "w") as f:
            attrs = f.create_group("attributes")
            attrs.attrs["dims"] = dims
            attrs.attrs["pdims"] = pdims
            var = f.create_group("variables")
            # [z, y, x] storage
            var.create_dataset(
                "dens", data=np.full((4, 4, 4), 1.0 + ifile, np.float32))
            var.create_dataset(
                "velx", data=np.full((4, 4, 4), 0.1, np.float32))
            var.create_dataset("vely", data=np.zeros((4, 4, 4), np.float32))
            var.create_dataset("velz", data=np.zeros((4, 4, 4), np.float32))
            var.create_dataset(
                "pres", data=np.full((4, 4, 4), 0.01, np.float32))

    snap = read_amun_snapshot(str(tmp_path), "amun_", 5, 2,
                              box_anchor=(0, 0, 0), box_sides=(1, 1, 1),
                              average_number_density=1e8, sound_speed=0.1,
                              average_temperature=100.0)
    assert snap.shape == (8, 4, 4)
    # mean density normalized to 1e8; file 1 brick is 2× file 0
    assert snap.number_density.mean() == pytest.approx(1e8, rel=1e-6)
    ratio = (snap.number_density[4:, :, :].mean()
             / snap.number_density[:4, :, :].mean())
    assert ratio == pytest.approx(2.0, rel=1e-6)
    # velocity unit: velx 0.1 = one code sound speed = physical cs at 100 K
    cs = np.sqrt(1.380649e-23 * 100.0 / 1.67262192369e-27)
    assert snap.velocity[0, 0, 0, 0] == pytest.approx(cs, rel=1e-5)
    # temperature: T_code = pres/dens scaled by T_avg/cs_code^2
    # (AmunSnapshotDensityFunction.cpp:220-221): brick 0 has p/rho = 0.01
    # -> 100 K, brick 1 has p/rho = 0.005 -> 50 K
    assert snap.temperature[:4].mean() == pytest.approx(100.0, rel=1e-5)
    assert snap.temperature[4:].mean() == pytest.approx(50.0, rel=1e-5)


def test_read_ascii_snapshot(tmp_path):
    path = tmp_path / "snap.txt"
    path.write_text(
        "# x y z n T\n"
        "0.125 0.125 0.125 100. 5000.\n"
        "0.875 0.875 0.875 200. 8000.\n")
    snap = read_ascii_snapshot(str(path), (4, 4, 4), (0, 0, 0), (1, 1, 1))
    assert snap.number_density[0, 0, 0] == 100.0
    assert snap.number_density[3, 3, 3] == 200.0
    assert snap.number_density[1, 2, 1] == 150.0  # mean fill
    assert snap.temperature[0, 0, 0] == 5000.0


REF_TEST = "/root/reference/test"


def test_read_phantom_reference_fixture():
    """Validates against the reference's own checked-in fixture
    (test/Phantomtest.dat vs Phantom_data.txt, cf.
    testPhantomSnapshotDensityFunction.cpp:40-75)."""
    import os

    from cmacionize_tpu.io.snapshots import read_phantom_snapshot

    if not os.path.exists(f"{REF_TEST}/Phantomtest.dat"):
        pytest.skip("reference fixtures not mounted")
    parts = read_phantom_snapshot(f"{REF_TEST}/Phantomtest.dat")
    expected = np.loadtxt(f"{REF_TEST}/Phantom_data.txt")
    assert parts.positions.shape == (100, 3)
    # file units are cgs (udist = 1 cm); expected columns are code units
    np.testing.assert_allclose(parts.positions, expected[:, :3] * 1e-2,
                               rtol=1e-14)
    np.testing.assert_allclose(parts.smoothing_lengths,
                               expected[:, 3] * 1e-2, rtol=1e-6)
    # massoftype 0.01 × umass 1 g → 1e-5 kg
    np.testing.assert_allclose(parts.masses, 1e-5, rtol=1e-14)


def test_read_sphng_reference_fixture():
    """testSPHNGSnapshotDensityFunction.cpp:120-135 equivalent: the tagged
    fixture, sink particle excluded."""
    import os

    from cmacionize_tpu.io.snapshots import read_sphng_snapshot

    if not os.path.exists(f"{REF_TEST}/SPHNGtest.dat"):
        pytest.skip("reference fixtures not mounted")
    parts = read_sphng_snapshot(f"{REF_TEST}/SPHNGtest.dat")
    expected = np.loadtxt(f"{REF_TEST}/SPHNG_data.txt")
    assert parts.positions.shape == (99, 3)  # 100 minus one sink
    np.testing.assert_allclose(parts.positions, expected[:, :3] * 1e-2,
                               rtol=1e-14)
    np.testing.assert_allclose(parts.masses, expected[:, 3] * 1e-3,
                               rtol=1e-14)
    np.testing.assert_allclose(parts.smoothing_lengths,
                               expected[:, 4] * 1e-2, rtol=1e-14)


def test_read_flash_reference_fixture():
    """The reference's FLASHtest.hdf5 (testFLASHSnapshotDensityFunction)."""
    import os

    if not os.path.exists(f"{REF_TEST}/FLASHtest.hdf5"):
        pytest.skip("reference fixtures not mounted")
    snap = read_flash_snapshot(f"{REF_TEST}/FLASHtest.hdf5")
    assert all(s > 0 for s in snap.shape)
    assert np.all(snap.number_density > 0)
    assert snap.temperature is not None
    assert np.all(snap.temperature > 0)


def test_read_amun_reference_fixture():
    import os

    if not os.path.exists(f"{REF_TEST}/Amun_test_00.h5"):
        pytest.skip("reference fixtures not mounted")
    snap = read_amun_snapshot(REF_TEST, "Amun_test_", 2, 4,
                              box_anchor=(0, 0, 0), box_sides=(1, 1, 1),
                              average_number_density=1e8)
    assert np.all(snap.number_density > 0)
    assert snap.number_density.mean() == pytest.approx(1e8, rel=1e-6)


def test_density_function_factory(tmp_path):
    """DensityFunctionFactory-equivalent dispatch by type string."""
    from cmacionize_tpu.models.density_functions import (
        density_function_from_params,
    )
    from cmacionize_tpu.models.grid import GridGeometry
    from cmacionize_tpu.utils.params import ParameterFile

    geom = GridGeometry(anchor=(0.0, 0.0, 0.0), sides=(1.0, 1.0, 1.0),
                        shape=(8, 8, 8), periodic=(False,) * 3)

    p = tmp_path / "homog.yml"
    p.write_text(
        "DensityFunction:\n  type: Homogeneous\n  density: 50. cm^-3\n"
        "  temperature: 6000. K\n")
    fields = density_function_from_params(ParameterFile(str(p)), geom)
    assert fields.number_density.shape == (8, 8, 8)
    np.testing.assert_allclose(fields.number_density, 50e6)
    np.testing.assert_allclose(fields.temperature, 6000.0)

    # fractal mask overlay conserves mass
    p2 = tmp_path / "frac.yml"
    p2.write_text(
        "DensityFunction:\n  type: Homogeneous\n  density: 50. cm^-3\n"
        "DensityMask:\n  type: Fractal\n  number of particles: 10000\n"
        "  number of levels: 3\n")
    fields2 = density_function_from_params(ParameterFile(str(p2)), geom)
    assert fields2.number_density.sum() == pytest.approx(
        fields.number_density.sum(), rel=1e-9)
    assert fields2.number_density.std() > 0

    # FLASH type goes through the resampler
    flash = tmp_path / "flash.h5"
    _write_flash(str(flash))
    p3 = tmp_path / "flash.yml"
    p3.write_text(
        f"DensityFunction:\n  type: FLASHSnapshot\n  filename: {flash}\n")
    fields3 = density_function_from_params(ParameterFile(str(p3)), geom)
    assert fields3.number_density.shape == (8, 8, 8)
    assert np.all(fields3.number_density > 0)

    # Phantom type deposits SPH particles
    import os
    if os.path.exists(f"{REF_TEST}/Phantomtest.dat"):
        geom_cm = GridGeometry(anchor=(0.0, 0.0, 0.0),
                               sides=(0.01, 0.01, 0.01), shape=(4, 4, 4),
                               periodic=(False,) * 3)
        p4 = tmp_path / "phantom.yml"
        p4.write_text(
            "DensityFunction:\n  type: PhantomSnapshot\n"
            f"  filename: {REF_TEST}/Phantomtest.dat\n")
        fields4 = density_function_from_params(ParameterFile(str(p4)),
                                               geom_cm)
        # total mass conserved: 100 × 1e-5 kg over (0.01 m)^3
        total_mass = (fields4.number_density.sum() * geom_cm.cell_volume
                      * 1.6737236e-27)
        assert total_mass == pytest.approx(100 * 1e-5, rel=1e-5)


def test_density_function_factory_analytic_types(tmp_path):
    """Fixture test per analytic DensityFunction type string — factory parity
    with /root/reference/src/DensityFunctionFactory.hpp:138-174."""
    from cmacionize_tpu import constants
    from cmacionize_tpu.models.density_functions import (
        density_function_from_params,
    )
    from cmacionize_tpu.models.grid import GridGeometry
    from cmacionize_tpu.utils.params import ParameterFile

    pc = 3.086e16
    geom = GridGeometry(
        anchor=(-2 * pc, -2 * pc, -2 * pc),
        sides=(4 * pc, 4 * pc, 4 * pc),
        shape=(8, 8, 8),
    )

    # DiscPatch: midplane density from the reference formula
    fields = density_function_from_params(ParameterFile({
        "DensityFunction": {
            "type": "DiscPatch",
            "surface density": "30. Msol pc^-2",
            "scale height": "0.2 pc",
            "disc position": "0. pc",
            "temperature": "1.e3 K",
        }}), geom)
    nd = fields.number_density
    assert np.all(np.isfinite(nd)) and nd.max() > 0
    # density decreases away from the midplane
    assert nd[4, 4, 0] < nd[4, 4, 4]

    # CoredDMProfile: n(0) == rho0 / mu m_p, decreasing outward
    fields = density_function_from_params(ParameterFile({
        "DensityFunction": {
            "type": "CoredDMProfile",
            "core radius": "1. pc",
            "maximum circular velocity": "21.1 km s^-1",
            "central density": "9.48e-21 g cm^-3",
            "temperature": "500. K",
        }}), geom)
    n0_expect = 9.48e-18 / (0.5 * constants.PROTON_MASS * 2.0)
    assert fields.number_density.max() < n0_expect  # centre not sampled
    r_center = fields.number_density[4, 4, 4]
    assert r_center > fields.number_density[0, 0, 0]
    assert np.allclose(fields.temperature, 500.0)

    # DiscIC: power-law slope γρ = 1.5 between two radii + tangential v
    fields = density_function_from_params(ParameterFile({
        "DensityFunction": {
            "type": "DiscIC",
            "mass": "18. Msol",
            "temperature": "500. K",
            "bondi density": "1.e-16 g cm^-3",
            "bondi velocity": "2. km s^-1",
        }}), geom)
    c = geom.cell_centers()
    r = np.sqrt((c**2).sum(-1))
    n = fields.number_density
    slope = (np.log(n[4, 4, 6]) - np.log(n[4, 4, 7])) / (
        np.log(r[4, 4, 6]) - np.log(r[4, 4, 7]))
    assert slope == pytest.approx(-1.5, rel=1e-3)
    v = fields.velocity
    assert v is not None
    # tangential: v ⊥ cylindrical radius
    dot = v[..., 0] * c[..., 0] + v[..., 1] * c[..., 1]
    scale = np.sqrt((v[..., :2] ** 2).sum(-1) * (c[..., :2] ** 2).sum(-1))
    assert np.all(np.abs(dot) <= 1e-10 * scale)

    # BondiProfile: rho ~ r^-3/2 far inside the Bondi radius; inflow v < 0
    geom_b = GridGeometry(
        anchor=(-1e13, -1e13, -1e13), sides=(2e13, 2e13, 2e13), shape=(8, 8, 8),
    )
    fields = density_function_from_params(ParameterFile({
        "DensityFunction": {
            "type": "BondiProfile",
            "central mass": "18. Msol",
            "Bondi density": "1.e-19 g cm^-3",
            "sound speed": "2.031 km s^-1",
        }}), geom_b)
    n = fields.number_density
    assert np.all(n > 0) and np.all(np.isfinite(n))
    cb = geom_b.cell_centers()
    radial_v = (fields.velocity * cb).sum(-1)
    assert np.all(radial_v < 0)  # accretion inflow everywhere

    # SpiralGalaxy
    kpc = 3.086e19
    geom_g = GridGeometry(
        anchor=(-12 * kpc,) * 3, sides=(24 * kpc,) * 3, shape=(8, 8, 8),
    )
    fields = density_function_from_params(ParameterFile({
        "DensityFunction": {
            "type": "SpiralGalaxy",
            "central density": "1. cm^-3",
            "scale length ISM": "6. kpc",
            "scale height ISM": "0.22 kpc",
        }}), geom_g)
    assert fields.number_density[4, 4, 4] > fields.number_density[0, 0, 4]


def test_density_function_interpolated(tmp_path):
    """Interpolated: z-only profile file in the reference's YAML-headed
    format (cf. test/test_interpolated_density.txt) is reproduced by
    trilinear interpolation."""
    from cmacionize_tpu.models.density_functions import (
        density_function_from_params,
    )
    from cmacionize_tpu.models.grid import GridGeometry
    from cmacionize_tpu.utils.params import ParameterFile

    zs = np.linspace(0.05, 0.95, 10)
    lines = "\n".join(f"{z} {1.0 + z * z}" for z in zs)
    content = f"""---
num_x: 0
xmin: 0. m
xmax: 1. m
num_y: 0
ymin: 0. m
ymax: 1. m
num_z: 10
zmin: 0. m
zmax: 1. m
num_column: 2
column_0_variable: z
column_0_unit: m
column_1_variable: number density
column_1_unit: m^-3
---
{lines}
"""
    path = tmp_path / "interp.txt"
    path.write_text(content)
    geom = GridGeometry(anchor=(0, 0, 0), sides=(1, 1, 1), shape=(4, 4, 8))
    fields = density_function_from_params(ParameterFile({
        "DensityFunction": {"type": "Interpolated", "filename": str(path)}
    }), geom)
    nd = fields.number_density
    zc = (np.arange(8) + 0.5) / 8.0
    expected = np.interp(zc, zs, 1.0 + zs * zs)
    np.testing.assert_allclose(nd[0, 0], expected, rtol=1e-6)
    # constant along collapsed axes
    np.testing.assert_allclose(
        nd, np.broadcast_to(nd[0:1, 0:1, :], nd.shape))
