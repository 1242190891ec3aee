"""Mesh data parallelism on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from warpdemux_tpu.config.utils import get_model_spc_config
from warpdemux_tpu.models.registry import load_model
from warpdemux_tpu.parallel.mesh import make_mesh, make_sharded_demux_step
from tests.synth import synth_batch


@pytest.fixture(scope="module")
def model_and_spc():
    return load_model("WDX4_rna004_v1_0"), get_model_spc_config(
        "WDX4_rna004_v1_0"
    )


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_sharded_step_matches_single_device(model_and_spc):
    model, spc = model_and_spc
    rng = np.random.default_rng(0)
    sigs, lens, _ = synth_batch(rng, 16)

    mesh = make_mesh(8)
    step = make_sharded_demux_step(model, spc, mesh)
    pred8, conf8, success8, counts = step(
        jnp.asarray(sigs), jnp.asarray(lens)
    )

    mesh1 = make_mesh(1)
    step1 = make_sharded_demux_step(model, spc, mesh1)
    pred1, conf1, success1, counts1 = step1(
        jnp.asarray(sigs), jnp.asarray(lens)
    )

    np.testing.assert_array_equal(np.asarray(pred8), np.asarray(pred1))
    np.testing.assert_allclose(
        np.asarray(conf8), np.asarray(conf1), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(counts1))
    assert int(counts.sum()) == 16


def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    jitted = jax.jit(fn)
    pred, conf = jitted(*args)
    assert pred.shape == (args[0].shape[0],)


def test_graft_entry_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
