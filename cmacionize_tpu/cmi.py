"""CMILibrary semantics: the stateful init/compute/destroy library surface.

Python counterpart of the reference's C library
(/root/reference/src/CMILibrary.cpp:46-95): ``cmi_init*`` loads a parameter
file and records the unit system + SPH→grid mapping type; each
``cmi_compute_neutral_fraction`` call grids the particle arrays, runs the
photoionization simulation configured by the parameter file, and returns
the per-particle hydrogen neutral fractions.  The C ABI shim
(native/cmi_c_library.c) embeds the interpreter and calls straight into
this module; Python hosts can use it directly.
"""

from __future__ import annotations

import numpy as np

_state = None

_MAPPINGS = {
    # reference factory strings, SPHArrayInterface.hpp:38-56
    "m over v": "m_over_v",
    "centroid": "centroid",
    "petkova": "petkova",
}


def cmi_init(parameter_file, num_threads=1, unit_length_in_SI=1.0,
             unit_mass_in_SI=1.0, mapping_type="M over V", talk=0,
             box_anchor=None, box_sides=None, periodic=False):
    """Set up the library simulation state (cmi_init / cmi_init_periodic_*).

    ``box_anchor``/``box_sides`` (in the caller's length unit) override the
    parameter file's SimulationBox for the periodic variants, exactly like
    the reference's cmi_init_periodic_dp.  ``num_threads`` is accepted for
    API parity (XLA manages its own threads).  ``talk`` > 0 enables status
    logging.
    """
    global _state
    from cmacionize_tpu.models.ionization_simulation import HOnlyConfig
    from cmacionize_tpu.utils.logging import TerminalLog
    from cmacionize_tpu.utils.params import ParameterFile

    params = ParameterFile(parameter_file)
    config = HOnlyConfig.from_params(params)
    geometry = config.geometry
    if box_anchor is not None:
        from cmacionize_tpu.models.grid import GridGeometry

        anchor = tuple(float(a) * unit_length_in_SI for a in box_anchor)
        sides = tuple(float(s) * unit_length_in_SI for s in box_sides)
        geometry = GridGeometry(
            anchor=anchor, sides=sides, shape=geometry.shape,
            periodic=(bool(periodic),) * 3)
    key = str(mapping_type).strip().lower()
    if key not in _MAPPINGS:
        raise ValueError(
            f"unknown mapping type {mapping_type!r} "
            "(expected 'M over V', 'centroid' or 'Petkova')")
    _state = {
        "params": params,
        "config": config,
        "geometry": geometry,
        "unit_length": float(unit_length_in_SI),
        "unit_mass": float(unit_mass_in_SI),
        "mapping": _MAPPINGS[key],
        "log": TerminalLog("status") if talk else None,
        "n_calls": 0,
    }


def cmi_compute_neutral_fraction(x, y, z, h, m):
    """Grid the particles, run the simulation, map back (cf.
    cmi_compute_neutral_fraction_dp).  Arrays are in the init call's
    units; returns the per-particle neutral fraction as float64."""
    if _state is None:
        raise RuntimeError("cmi_init has not been called")
    from cmacionize_tpu import api

    s = _state
    ul, um = s["unit_length"], s["unit_mass"]
    pos = np.stack([
        np.asarray(x, np.float64), np.asarray(y, np.float64),
        np.asarray(z, np.float64)], axis=1) * ul
    masses = np.asarray(m, np.float64) * um
    smoothing = np.asarray(h, np.float64) * ul
    cfg = s["config"]
    geometry = s["geometry"]
    if s["log"] is not None:
        s["log"].status(
            f"cmi: computing neutral fractions for {len(masses)} particles")
    xh = api.compute_neutral_fraction(
        pos, masses,
        geometry.anchor, geometry.sides, geometry.shape,
        source_position=cfg.source_position,
        luminosity=cfg.luminosity,
        cross_section=cfg.cross_section,
        recombination_rate=cfg.recombination_rate,
        temperature=cfg.temperature,
        n_photons=cfg.n_photons,
        n_iterations=cfg.n_iterations,
        mapping=s["mapping"],
        smoothing_lengths=smoothing,
        periodic=bool(geometry.periodic[0]),
    )
    s["n_calls"] += 1
    return np.asarray(xh, np.float64)


def cmi_compute_buffers(mx, my, mz, mh, mm, mout, n,
                        in_dtype="f8", h_dtype=None, out_dtype=None):
    """Zero-copy entry point for the C ABI shim: each argument is a
    memoryview over caller-owned memory (PyMemoryView_FromMemory); the
    result is written into ``mout`` in place.  ``h_dtype``/``out_dtype``
    cover the reference's mixed-precision variant (_mp: double positions,
    float h/m/out)."""
    h_dtype = h_dtype or in_dtype
    out_dtype = out_dtype or h_dtype
    x = np.frombuffer(mx, dtype=in_dtype, count=n)
    y = np.frombuffer(my, dtype=in_dtype, count=n)
    z = np.frombuffer(mz, dtype=in_dtype, count=n)
    h = np.frombuffer(mh, dtype=h_dtype, count=n)
    m = np.frombuffer(mm, dtype=h_dtype, count=n)
    xh = cmi_compute_neutral_fraction(x, y, z, h, m)
    out = np.frombuffer(mout, dtype=out_dtype, count=n)
    out[:] = xh.astype(out_dtype)
    return 0


def cmi_destroy():
    """Release the library state (cmi_destroy)."""
    global _state
    _state = None
