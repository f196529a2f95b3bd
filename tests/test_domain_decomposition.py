"""Domain-decomposed MC tests on the 8-virtual-device CPU mesh.

The equivalent of the reference's distributed test strategy
(testDensitySubGrid_MPI.cpp — pack/send/unpack across ranks on one host):
the slab-sharded superstep loop must reproduce the single-device physics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmacionize_tpu.parallel.domain import make_domain_mc_iteration
from cmacionize_tpu.parallel.mesh import make_mesh


def _setup(shape=(32, 16, 16), n_photons=16384):
    dx = 10 * 3.086e16 / shape[0]
    sigma = 6.3e-22
    params = dict(
        global_shape=shape,
        n_photons=n_photons,
        sigma_dx=sigma * dx,
        source_gpos=(shape[0] / 2.0, shape[1] / 2.0, shape[2] / 2.0),
        jfac_scale=4.26e49 * sigma * dx / (n_photons * dx**3),
        alpha=4e-19,
    )
    return params, dx


def test_domain_decomposed_matches_single_device():
    mesh = make_mesh(8, axis_names=("x",))
    params, dx = _setup()
    shape = params["global_shape"]
    step, shardings = make_domain_mc_iteration(mesh, **params)

    nd = jnp.full(shape, 1e8, jnp.float32)
    xh = jnp.full(shape, 1e-6, jnp.float32)
    nd = jax.device_put(nd, shardings["field"])
    xh = jax.device_put(xh, shardings["field"])

    # also run the equivalent single-device iteration for comparison
    from cmacionize_tpu.models.ionization_simulation import h_only_iteration

    xh_s = jnp.full(shape, 1e-6, jnp.float32)
    for i in range(6):
        keys = jax.random.split(jax.random.PRNGKey(100 + i), 8)
        xh, jH, n_esc = step(keys, xh, nd)
        xh_s, _, n_esc_s = h_only_iteration(
            jax.random.PRNGKey(200 + i),
            xh_s,
            jnp.full(shape, 1e8, jnp.float32),
            shape=shape,
            periodic=(False, False, False),
            n_photons=params["n_photons"],
            sigma_dx=params["sigma_dx"],
            source_gpos=params["source_gpos"],
            jfac_scale=params["jfac_scale"],
            alpha=params["alpha"],
        )

    xh_np = np.asarray(xh)
    xh_s_np = np.asarray(xh_s)
    assert np.all(np.isfinite(xh_np))
    # identical physics, different RNG streams: ionized volumes must agree
    v_dd = (xh_np < 0.5).sum()
    v_sd = (xh_s_np < 0.5).sum()
    assert v_dd == pytest.approx(v_sd, rel=0.15)
    # center ionized on both
    c = tuple(s // 2 for s in shape)
    assert xh_np[c] < 1e-3 and xh_s_np[c] < 1e-3
    # corners neutral
    assert xh_np[0, 0, 0] > 0.9


def test_domain_decomposed_conserves_packets():
    # transparent medium: every packet must escape, none lost in exchange
    mesh = make_mesh(8, axis_names=("x",))
    shape = (32, 8, 8)
    n_photons = 4096
    step, shardings = make_domain_mc_iteration(
        mesh,
        global_shape=shape,
        n_photons=n_photons,
        sigma_dx=1e-30,
        source_gpos=(16.0, 4.0, 4.0),
        jfac_scale=1.0,
        alpha=4e-19,
    )
    nd = jax.device_put(jnp.full(shape, 1e8, jnp.float32), shardings["field"])
    xh = jax.device_put(jnp.full(shape, 1e-6, jnp.float32), shardings["field"])
    keys = jax.random.split(jax.random.PRNGKey(0), 8)
    _, _, n_escaped = step(keys, xh, nd)
    assert int(n_escaped) == n_photons
