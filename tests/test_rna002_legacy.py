"""RNA002 legacy-model surface: registry entries resolve, arrays load, the
chemistry config parses with the 15k preload, and a full prep step runs
(reference DEPRECATED/ assets, SURVEY 2.11)."""

import numpy as np

from warpdemux_tpu.config.utils import load_chemistry_config
from warpdemux_tpu.models.registry import available_models, load_model, model_config


def test_rna002_models_registered_and_loadable():
    names = [n for n in available_models() if "rna002" in n]
    assert len(names) == 6
    for n in names:
        cfg = model_config(n)
        assert cfg["SQK"] == "RNA002"
        assert cfg.get("deprecated") is True
        m = load_model(n)
        assert m.X_sv.shape[1] == 25
        assert m.n_classes == cfg["num_bcs"] + 1  # noise class


def test_rna002_chemistry_config():
    spc = load_chemistry_config("rna002_70bps@v0.4.4")
    assert spc.primary_method == "llr"
    assert spc.sig_preload_size == 15000
    assert spc.fingerprint.num_events == 110
    assert spc.fingerprint.min_obs_per_base == 15
    assert spc.fingerprint.running_stat_width == 30


def test_rna002_prep_step_runs():
    from warpdemux_tpu.pipeline.step import make_demux_step
    from warpdemux_tpu.utils.synthetic import synth_batch

    spc = load_chemistry_config("rna002_70bps@v0.4.4")
    model = load_model("WDX4_rna002_v0_4_4")
    step = make_demux_step(model, spc, with_predict=True)
    rng = np.random.default_rng(0)
    sigs, lens, _ = synth_batch(rng, 4, L=15000)
    import jax

    out = jax.device_get(step(sigs, lens)).unpack()
    assert np.asarray(out.pred).shape == (4,)
    ok = np.asarray(out.success)
    pred = np.asarray(out.pred)[ok]
    assert np.isin(pred, [4, 5, 6, 8, -1]).all()
