"""Config-utility tests: --export overrides (key=val + whole-TOML forms,
reference parser.py:253-307 + :504-512), layered merge, and the run-dir
TOML snapshot round-trip."""

import tomllib

import pytest

from warpdemux_tpu.config.utils import (
    dump_toml,
    load_chemistry_config,
    parse_export_overrides,
    resolve_model_chemistry_dict,
)


def test_parse_export_key_values():
    d = parse_export_overrides(
        ["core.max_obs_trace=8000", "segmentation.normalization=median",
         "mvs_polya.pA_var_range=[-1.0, 25.0]"]
    )
    assert d["core"]["max_obs_trace"] == 8000
    assert d["segmentation"]["normalization"] == "median"
    assert d["mvs_polya"]["pA_var_range"] == [-1.0, 25.0]


def test_parse_export_toml_file(tmp_path):
    f = tmp_path / "ov.toml"
    f.write_text("[core]\nmax_obs_trace = 9000\n[cnn_boundaries]\ncnn_detect = false\n")
    d = parse_export_overrides([str(f), "core.min_obs_adapter=1500"])
    assert d["core"] == {"max_obs_trace": 9000, "min_obs_adapter": 1500}
    assert d["cnn_boundaries"]["cnn_detect"] is False


def test_export_overrides_flow_into_config():
    spc = load_chemistry_config(
        "rna004_130bps@v1.0",
        {"core": {"max_obs_trace": 8000},
         "cnn_boundaries": {"cnn_detect": False},
         "llr_boundaries": {"llr_detect": True}},
    )
    assert spc.sig_preload_size == 8000
    assert spc.primary_method == "llr"


def test_bad_export_raises():
    with pytest.raises(ValueError):
        parse_export_overrides(["not_a_pair"])


def test_snapshot_toml_roundtrip():
    d = resolve_model_chemistry_dict(
        "WDX4_rna004_v1_0", {"core": {"max_obs_trace": 7777}}
    )
    text = dump_toml(d)
    back = tomllib.loads(text)
    assert back["core"]["max_obs_trace"] == 7777
    assert back["segmentation"]["num_events"] == d["segmentation"]["num_events"]
    assert back["cnn_boundaries"]["cnn_detect"] == d["cnn_boundaries"]["cnn_detect"]
