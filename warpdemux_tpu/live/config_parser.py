"""Live-balancing TOML configuration (reference live_balancing/config_parser.py
schema: [model], [flowcell], [[balancers]], [processing], [acquisition],
[balancing], [reporting])."""

from __future__ import annotations

import tomllib
from pathlib import Path

from warpdemux_tpu.live.balancer import BalancerConfig, BarcodeBalancers
from warpdemux_tpu.live.session import SessionConfig

FLOWCELL_CHANNELS = {"flongle": 126, "minion": 512, "promethion": 3000}


def parse_live_config(path: str | Path) -> tuple[SessionConfig, list[BalancerConfig], list[float], int]:
    with open(path, "rb") as f:
        d = tomllib.load(f)
    model_name = d.get("model", {}).get("model_name", "WDX4_rna004_v1_0")
    acq = d.get("acquisition", {})
    bal = d.get("balancing", {})
    rep = d.get("reporting", {})
    fc = d.get("flowcell", {}).get("flowcell_type", "minion")
    n_channels = FLOWCELL_CHANNELS.get(fc, 512)

    session_cfg = SessionConfig(
        model_name=model_name,
        max_chunk_size=int(acq.get("max_chunk_size", 12000)),
        max_missed_start_offset=int(acq.get("max_missed_start_offset", 400)),
        pred_conf_threshold=float(bal.get("pred_conf_threshold", 0.2)),
        save_path=str(rep.get("save_path", "results")),
    )

    balancer_cfgs, fracs = [], []
    for b in d.get("balancers", []):
        balancer_cfgs.append(
            BalancerConfig(
                balance_type=str(b.get("balance_type", "none")),
                balance_threshold=float(b.get("balance_threshold", 0.4)),
                min_stat=float(b.get("min_stat", 10.0)),
                reject_duration=float(b.get("reject_duration", 0.1)),
                wait_to_see=float(b.get("wait_to_see", 60.0)),
                barcodes_blacklist=tuple(b.get("barcodes_blacklist", ())),
                barcodes_ignorelist=tuple(b.get("barcodes_ignorelist", ())),
                max_stats={
                    int(k): float(v) for k, v in b.get("max_stats", {}).items()
                },
                pod5_watch_dir=str(b.get("pod5_watch_dir", "")),
                pod5_check_interval=float(b.get("pod5_check_interval", 0.5)),
            )
        )
        fracs.append(float(b.get("channel_frac", 1.0)))
    if not balancer_cfgs:
        balancer_cfgs = [BalancerConfig()]
        fracs = [1.0]
    return session_cfg, balancer_cfgs, fracs, n_channels


def _live_chemistry_overlay(session_cfg):
    """Resolve the model's spc_live chemistry overlay ([streaming] +
    [real_range]; reference config/utils.py:58-65) into the session config.
    Models without an spc_live entry keep the session defaults."""
    from dataclasses import replace

    from warpdemux_tpu.config.utils import load_chemistry_dict
    from warpdemux_tpu.detect.streaming import RealRangeConfig, StreamingConfig
    from warpdemux_tpu.models.registry import model_config

    try:
        spc_live = model_config(session_cfg.model_name).get("spc_live")
    except KeyError:
        return session_cfg
    if not spc_live:
        return session_cfg
    d = load_chemistry_dict(spc_live)
    st, rr, core = d.get("streaming", {}), d.get("real_range", {}), d.get(
        "core", {}
    )

    def rng(v, default):
        return default if v is None else tuple(float(x) for x in v)

    streaming = StreamingConfig(
        min_obs_adapter=int(core.get("min_obs_adapter", 1500)),
        search_increment_step=int(st.get("search_increment_step", 200)),
        polya_window=int(st.get("polyA_window", 200)),
        pA_var_window=int(st.get("pA_var_window", 500)),
        pA_var_max=float(rng(st.get("pA_var_range"), (0.0, 30.0))[1]),
        min_obs_post_loc=int(st.get("min_obs_post_loc", 100)),
    )
    real_range = RealRangeConfig(
        local_range=rng(rr.get("local_range"), (7.0, 35.0)),
        adapter_mad_range=rng(rr.get("adapter_mad_range"), (3.0, 12.0)),
        mean_window=int(rr.get("mean_window", 300)),
        max_obs_local_range=int(rr.get("max_obs_local_range", 5000)),
    )
    return replace(session_cfg, streaming=streaming, real_range=real_range)


def build_session(config_file: str | Path, client=None, model=None):
    """Assemble a Session from a live TOML (dummy client by default)."""
    from warpdemux_tpu.models.registry import load_model

    session_cfg, bal_cfgs, fracs, n_channels = parse_live_config(config_file)
    session_cfg = _live_chemistry_overlay(session_cfg)
    if model is None:
        model = load_model(session_cfg.model_name)
    balancers = BarcodeBalancers.from_configs(
        model.n_classes - 1, bal_cfgs, fracs, n_channels=n_channels
    )
    if client is None:
        from warpdemux_tpu.live.dummy import DummyClient

        client = DummyClient()
    from warpdemux_tpu.live.session import Session

    return Session(client, session_cfg, balancers, model=model)
