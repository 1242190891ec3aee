"""Config resolution: model name -> chemistry TOML -> SigProcConfig, with
dotted-key CLI overrides (the reference's layered loading,
warpdemux/config/utils.py:42-55 and --export overrides parser.py:504-512)."""

from __future__ import annotations

import ast
import tomllib
from dataclasses import replace
from pathlib import Path

from warpdemux_tpu.config.sig_proc import SigProcConfig

CONFIG_DIR = Path(__file__).parent / "config_files"


def _deep_merge(base: dict, overlay: dict) -> dict:
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def load_chemistry_dict(name: str) -> dict:
    path = CONFIG_DIR / f"{name}.toml"
    if not path.exists():
        raise FileNotFoundError(
            f"chemistry config {name!r} not found in {CONFIG_DIR}"
        )
    with open(path, "rb") as f:
        return tomllib.load(f)


def load_chemistry_config(name: str, overrides: dict | None = None) -> SigProcConfig:
    d = load_chemistry_dict(name)
    if overrides:
        d = _deep_merge(d, overrides)
    return SigProcConfig.from_dict(d)


def get_model_spc_config(model_name: str, overrides: dict | None = None):
    """Resolve a model name to its chemistry SigProcConfig via the registry."""
    from warpdemux_tpu.models.registry import model_config

    spc_name = model_config(model_name)["spc"]
    return load_chemistry_config(spc_name, overrides)


def parse_export_overrides(pairs: list[str]) -> dict:
    """Parse `section.key=value` CLI overrides into a nested dict
    (the reference's --export semantics, parser.py:253-307). An argument
    naming an existing .toml file is loaded and merged whole."""
    out: dict = {}
    for pair in pairs:
        if pair.endswith(".toml") and Path(pair).exists():
            with open(pair, "rb") as f:
                out = _deep_merge(out, tomllib.load(f))
            continue
        if "=" not in pair:
            raise ValueError(f"override {pair!r} is not key=value")
        key, val = pair.split("=", 1)
        try:
            value = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            value = val
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return out


def apply_overrides(spc_dict: dict, overrides: dict) -> dict:
    return _deep_merge(spc_dict, overrides)


def _toml_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v == float("inf"):
            return "inf"
        if v == float("-inf"):
            return "-inf"
        return repr(v)
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, str):
        return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_toml_value(x) for x in v) + "]"
    raise TypeError(f"cannot serialize {type(v)} to TOML")


def dump_toml(d: dict) -> str:
    """Serialize a two-level {section: {key: value}} dict to TOML (used to
    snapshot the resolved chemistry config into the run dir, mirroring the
    reference's config.toml snapshot, main.py:69-71)."""
    lines = []
    for k, v in d.items():
        if not isinstance(v, dict):
            lines.append(f"{k} = {_toml_value(v)}")
    for section, body in d.items():
        if isinstance(body, dict):
            lines.append("")
            lines.append(f"[{section}]")
            for k, v in body.items():
                lines.append(f"{k} = {_toml_value(v)}")
    return "\n".join(lines) + "\n"


def resolve_model_chemistry_dict(
    model_name: str, overrides: dict | None = None
) -> dict:
    """The merged chemistry dict (registry -> chemistry TOML -> overrides)
    for snapshotting alongside a run."""
    from warpdemux_tpu.models.registry import model_config

    d = load_chemistry_dict(model_config(model_name)["spc"])
    if overrides:
        d = _deep_merge(d, overrides)
    return d
