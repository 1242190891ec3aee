"""The WDX_MEDIAN_IMPL flag gating the detect-stage median implementation
(VERDICT r3 weak #4).

The detect stage's ranged medians default to the Pallas VMEM kernel
because this environment's remote TPU runtime miscompiles the inlined
XLA radix path. The flag lets a deployment flip the XLA path back on
without editing source; these tests pin (a) the flag wiring and (b) that
both paths produce identical detect results on CPU. The TPU-side probe —
which is expected to FAIL while the runtime bug persists, and will start
passing (flagging the workaround for removal) once fixed — is gated
behind WDX_TPU_TESTS=1 because the shared tunnel makes device tests
minutes-slow.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

_DETECT_SNIPPET = """
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
from warpdemux_tpu.detect import boundaries as bd

print("pallas_medians", bd._PALLAS_MEDIANS)
rng = np.random.default_rng(3)
B, L = 8, 6000
sig = np.repeat(rng.normal(78, 11, (B, L // 25)), 25, axis=1)[:, :L]
a_end = rng.integers(2000, 3500, B)
idx = np.arange(L)[None, :]
sig = np.where(
    (idx >= a_end[:, None]) & (idx < a_end[:, None] + 1200), 104.0, sig
)
sig = (sig + rng.normal(0, 1.8, (B, L))).astype(np.float32)
lens = np.full(B, L, np.int32)
cfg = bd.DetectConfig(method="llr")
res = bd.detect_boundaries_with_fallback(sig, lens, cfg=cfg)
out = {k: np.asarray(getattr(res, k)) for k in
       ("adapter_start", "adapter_end", "polya_end", "fail_code",
        "adapter_med", "adapter_mad")}
np.savez(sys.argv[1], **out)
"""


def _run_detect(tmp_path, env_val):
    env = dict(os.environ)
    if env_val is None:
        env.pop("WDX_MEDIAN_IMPL", None)
    else:
        env["WDX_MEDIAN_IMPL"] = env_val
    out = tmp_path / f"out_{env_val or 'default'}.npz"
    r = subprocess.run(
        [sys.executable, "-c", _DETECT_SNIPPET, str(out)],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr
    flag = [
        ln for ln in r.stdout.splitlines() if ln.startswith("pallas_medians")
    ][0].split()[1]
    return flag, np.load(out)


def test_flag_selects_implementation_and_results_match(tmp_path):
    flag_default, out_default = _run_detect(tmp_path, None)
    flag_xla, out_xla = _run_detect(tmp_path, "xla")
    flag_pallas, out_pallas = _run_detect(tmp_path, "pallas")
    assert flag_default == "True"  # pallas is the production default
    assert flag_xla == "False"
    assert flag_pallas == "True"
    for k in out_default.files:
        np.testing.assert_array_equal(out_default[k], out_xla[k])
        np.testing.assert_array_equal(out_default[k], out_pallas[k])


@pytest.mark.skipif(
    not os.environ.get("WDX_TPU_TESTS"),
    reason="device test: set WDX_TPU_TESTS=1 to probe the TPU runtime's "
    "inlined-XLA-median miscompile (expected to fail until fixed)",
)
@pytest.mark.xfail(
    reason="remote TPU runtime miscompiles the inlined XLA radix path "
    "(outputs come back InvalidArgument); when this XPASSes the "
    "workaround default in detect/boundaries.py can be dropped",
    strict=True,
)
def test_xla_median_path_on_tpu(tmp_path):
    env = dict(os.environ, WDX_MEDIAN_IMPL="xla")
    snippet = _DETECT_SNIPPET.replace(
        'jax.config.update("jax_platforms", "cpu")\n', ""
    ).replace('jax.config.update("jax_enable_x64", True)\n', "")
    out = tmp_path / "tpu.npz"
    r = subprocess.run(
        [sys.executable, "-c", snippet, str(out)],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    res = np.load(out)
    assert np.isfinite(res["adapter_end"]).all()
