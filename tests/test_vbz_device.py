"""Tests for the on-device VBZ inner-layout decode (ops/vbz_device.py) and
the compressed-wire batch generator (io/pod5.yield_vbz_batches)."""

import numpy as np
import jax.numpy as jnp
import pytest
from pathlib import Path

from warpdemux_tpu.ops.vbz_device import (
    inner_layout_from_adc,
    pack_inner_host,
    vbz_decode_batch,
)

POD5 = "/root/reference/test_data/live_balancing/small_pod5_0.pod5"


def test_device_decode_matches_host():
    rng = np.random.default_rng(0)
    B, n = 5, 4096
    sigs = [
        np.cumsum(rng.integers(-120, 120, size=n)).astype(np.int16)
        for _ in range(B)
    ]
    bodies = [inner_layout_from_adc(s) for s in sigs]
    width = max(len(b) - (n + 7) // 8 for b in bodies)
    keys, data = pack_inner_host(bodies, n, width)
    adc = np.asarray(
        vbz_decode_batch(jnp.asarray(keys), jnp.asarray(data), n)
    )
    for b in range(B):
        np.testing.assert_array_equal(adc[b].astype(np.int16), sigs[b])


def test_device_decode_wide_values():
    # deltas crossing the 1-byte/2-byte split in both directions (ADC
    # deltas are bounded by the +/-2048 digitizer range in practice)
    sig = np.array([0, 1, 200, 100, -2000, -2001, 2047], np.int16)
    n = sig.size
    body = inner_layout_from_adc(sig)
    keys, data = pack_inner_host([body], n, len(body))
    adc = np.asarray(vbz_decode_batch(jnp.asarray(keys), jnp.asarray(data), n))
    np.testing.assert_array_equal(adc[0].astype(np.int16), sig)


@pytest.mark.skipif(not Path(POD5).exists(), reason="fixture unavailable")
def test_vbz_batches_match_adc_batches():
    from warpdemux_tpu.io.pod5 import yield_adc_batches, yield_vbz_batches

    adc_batches = list(
        yield_adc_batches([POD5], None, None, batch_size=64, preload_size=10000)
    )
    vbz_batches = list(
        yield_vbz_batches([POD5], None, None, batch_size=64, preload_size=10000)
    )
    assert len(adc_batches) == len(vbz_batches)
    for ab, vb in zip(adc_batches, vbz_batches):
        adc_ref, off_r, sc_r, lens_r, full_r, ids_r = ab
        keys, data, off, sc, lens, full, ids = vb
        np.testing.assert_array_equal(lens, lens_r)
        np.testing.assert_array_equal(full, full_r)
        assert list(ids) == list(ids_r)
        np.testing.assert_allclose(off, off_r)
        # wire is smaller than int16
        assert keys.nbytes + data.nbytes < adc_ref.nbytes
        dec = np.asarray(
            vbz_decode_batch(jnp.asarray(keys), jnp.asarray(data), 10000)
        ).astype(np.int16)
        for i in range(len(ids)):
            n = int(lens[i])
            np.testing.assert_array_equal(dec[i, :n], adc_ref[i, :n])


@pytest.mark.skipif(not Path(POD5).exists(), reason="fixture unavailable")
def test_vbz_step_matches_adc_step():
    from warpdemux_tpu.config.utils import get_model_spc_config
    from warpdemux_tpu.io.pod5 import yield_adc_batches, yield_vbz_batches
    from warpdemux_tpu.models.registry import load_model
    from warpdemux_tpu.pipeline.step import make_demux_step

    model = load_model("WDX4_rna004_v1_0")
    spc = get_model_spc_config("WDX4_rna004_v1_0")
    step_a = make_demux_step(model, spc, input_format="adc")
    step_v = make_demux_step(model, spc, input_format="vbz")
    ab = next(
        iter(yield_adc_batches([POD5], None, None, batch_size=32,
                               preload_size=10000))
    )
    vb = next(
        iter(yield_vbz_batches([POD5], None, None, batch_size=32,
                               preload_size=10000))
    )
    import jax

    ra = jax.device_get(step_a(*ab[:4])).unpack()
    rv = jax.device_get(step_v(*vb[:5])).unpack()
    np.testing.assert_array_equal(np.asarray(ra.pred), np.asarray(rv.pred))
    np.testing.assert_array_equal(
        np.asarray(ra.fail_code), np.asarray(rv.fail_code)
    )
    np.testing.assert_allclose(
        np.asarray(ra.conf), np.asarray(rv.conf), rtol=1e-6, atol=1e-7
    )
