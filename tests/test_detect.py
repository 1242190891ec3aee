import numpy as np
import jax.numpy as jnp

from warpdemux_tpu.detect.boundaries import detect_boundaries_batch, DetectConfig
from warpdemux_tpu.detect.containers import fail_code_to_reason
from tests.synth import synth_batch, synth_read


def test_synthetic_boundaries_recovered():
    rng = np.random.default_rng(0)
    sigs, lens, truths = synth_batch(rng, 24)
    res = detect_boundaries_batch(jnp.asarray(sigs), jnp.asarray(lens), DetectConfig())
    succ = np.asarray(res.success)
    assert succ.mean() > 0.9, fail_code_to_reason(np.asarray(res.fail_code))
    ps = np.asarray(res.polya_start)
    pe = np.asarray(res.polya_end)
    for b in range(len(truths)):
        if not succ[b]:
            continue
        assert abs(ps[b] - truths[b]["polya_start"]) < 150, (
            b, ps[b], truths[b]
        )
        want_pe = min(truths[b]["polya_end"], int(lens[b]))
        assert abs(pe[b] - want_pe) < 400, (b, pe[b], truths[b])


def test_region_stats_sane():
    rng = np.random.default_rng(1)
    sigs, lens, truths = synth_batch(rng, 8)
    res = detect_boundaries_batch(jnp.asarray(sigs), jnp.asarray(lens), DetectConfig())
    succ = np.asarray(res.success)
    for b in np.nonzero(succ)[0]:
        assert 60 < float(res.adapter_med[b]) < 90
        assert 95 < float(res.polya_med[b]) < 115
        assert float(res.polya_std[b]) < 10


def test_no_polya_fails():
    rng = np.random.default_rng(2)
    # pure adapter-like signal, no elevated flat region
    sig, _ = synth_read(rng, adapter_len=9500, polya_len=0, rna_len=0)
    sigs = np.zeros((2, 10000), np.float32)
    sigs[0, : sig.size] = sig[:10000]
    sigs[1] = 75.0  # flat at adapter level
    res = detect_boundaries_batch(
        jnp.asarray(sigs), jnp.asarray([10000, 10000], np.int32), DetectConfig()
    )
    assert not bool(res.success[0])
    assert not bool(res.success[1])
    reasons = fail_code_to_reason(np.asarray(res.fail_code))
    assert reasons[0] == "no polyA found"


def test_short_signal_fails():
    sigs = np.full((1, 10000), 80.0, np.float32)
    res = detect_boundaries_batch(
        jnp.asarray(sigs), jnp.asarray([500], np.int32), DetectConfig()
    )
    assert fail_code_to_reason(np.asarray(res.fail_code)) == ["signal too short"]


def test_adapter_length_gates():
    rng = np.random.default_rng(3)
    # adapter longer than max_obs_adapter
    sig, _ = synth_read(rng, adapter_len=7500, polya_len=2000, rna_len=500)
    sigs = sig[None, :10000].copy()
    res = detect_boundaries_batch(
        jnp.asarray(sigs), jnp.asarray([10000], np.int32), DetectConfig()
    )
    assert fail_code_to_reason(np.asarray(res.fail_code)) == ["adapter too long"]
    # adapter shorter than min_obs_adapter (but long enough that the
    # adapter-level proxy median is still dominated by adapter samples)
    sig2, _ = synth_read(rng, adapter_len=1500, polya_len=2500, rna_len=7000)
    res2 = detect_boundaries_batch(
        jnp.asarray(sig2[None, :10000].copy()),
        jnp.asarray([10000], np.int32),
        DetectConfig(),
    )
    assert fail_code_to_reason(np.asarray(res2.fail_code)) == ["adapter too short"]


def test_med_shift_and_real_range_checks():
    rng = np.random.default_rng(4)
    # real-range bounds are calibrated to real adapter statistics; keep the
    # synthetic adapter's level spread in that regime
    sigs, lens, truths = synth_batch(rng, 6, adapter_spread=8.0)
    cfg = DetectConfig(
        detect_med_shift=True, real_signal_check=True, mvs_detect_check=True
    )
    res = detect_boundaries_batch(jnp.asarray(sigs), jnp.asarray(lens), cfg)
    # synthetic reads are healthy: checks should mostly pass
    assert np.asarray(res.success).mean() > 0.8, fail_code_to_reason(
        np.asarray(res.fail_code)
    )


def test_summary_frame_columns():
    rng = np.random.default_rng(5)
    sigs, lens, _ = synth_batch(rng, 4)
    res = detect_boundaries_batch(jnp.asarray(sigs), jnp.asarray(lens), DetectConfig())
    df = res.to_summary_frame(
        [f"r{i}" for i in range(4)], np.full(4, 20000), np.asarray(lens)
    )
    for col in ["read_id", "adapter_start", "polya_mad", "rna_preloaded_len", "fail_reason"]:
        assert col in df.columns


def test_rolling_pallas_kernels_match_jnp():
    """Interpret-mode parity for the rolling-stats kernels: the int
    run-sum must be bit-identical; mean/var agree to prefix-sum rounding."""
    import jax.numpy as jnp
    from warpdemux_tpu.detect.boundaries import (
        _rolling_mean_var_fwd,
        _shift_clamp,
    )
    from warpdemux_tpu.ops.rolling_pallas import (
        rolling_mean_var_pallas,
        rolling_run_sum_pallas,
    )

    rng = np.random.default_rng(31)
    B, L = 5, 2048
    x = jnp.asarray(rng.normal(80, 12, (B, L)), jnp.float32)
    m_want, vf_want = _rolling_mean_var_fwd(x, 300)
    _, vw_want = _rolling_mean_var_fwd(x, 150)
    m, vf, vw = rolling_mean_var_pallas(x, 300, 150, interpret=True)
    # both lowerings compute window sums as cumsum differences, so the
    # shrinking tail windows (n -> 1) carry up to ulp(full-row cumsum)
    # of absolute error each; the two prefix associations just round it
    # differently. Thresh gates compare ~1.3x level ratios — 5e-4
    # relative is far inside their margin.
    np.testing.assert_allclose(
        np.asarray(m), np.asarray(m_want), rtol=5e-4, atol=0.05
    )
    # variance adds catastrophic cancellation (s2/n - mean^2): on the
    # shrinking tail windows true var -> 0 while the cumsum-diff error
    # stays at ulp(full-row c2), so relative comparison is meaningful
    # only where the window is full; the tail gets an absolute bound.
    for got, want, w in ((vf, vf_want, 300), (vw, vw_want, 150)):
        got, want = np.asarray(got), np.asarray(want)
        np.testing.assert_allclose(
            got[:, : L - w], want[:, : L - w], rtol=3e-3, atol=0.1
        )
        np.testing.assert_allclose(
            got[:, L - w :], want[:, L - w :], atol=5.0
        )

    mask = jnp.asarray(rng.random((B, L)) < 0.4)
    z = jnp.zeros((B, 1), jnp.int32)
    cc = jnp.concatenate(
        [z, jnp.cumsum(mask.astype(jnp.int32), axis=1)], axis=1
    )
    want = _shift_clamp(cc, 130) - cc[:, :L]
    got = rolling_run_sum_pallas(mask, 130, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_rolling_kernels_on_device():
    """Non-interpret Mosaic-lowered parity for the rolling kernels at the
    production L=10000 (not a 128-lane multiple) and an odd L=4444: the
    interpret-mode test above bypasses the Mosaic lowering of pltpu.roll,
    which is exactly where a non-lane-multiple miscompile would live
    (ADVICE r4). Runs tools/check_rolling_device.py in a subprocess (the
    suite conftest pins the CPU backend); the int run-sum kernel must be
    bit-exact, mean/var within the documented prefix-sum rounding class."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    import pytest

    if not os.environ.get("WDX_TPU_TESTS"):
        pytest.skip(
            "device test: set WDX_TPU_TESTS=1 to lower the rolling kernels "
            "through Mosaic on the attached TPU (verified green on the "
            "round-5 device; see STATUS.md)"
        )
    repo = Path(__file__).resolve().parents[1]
    out = subprocess.run(
        [sys.executable, str(repo / "tools" / "check_rolling_device.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=repo,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]


def test_rolling_detect_fused_matches_unfused():
    """Interpret-mode parity for the fused detect kernel
    (ops/rolling_pallas.rolling_detect_pallas): rolling stats match the
    jnp path to prefix-sum rounding, and BOTH candidate run-sums are
    bit-identical to _run_sum over the XLA-built masks (the fused path
    rebuilds the masks in-kernel from its own mean/var values)."""
    import jax.numpy as jnp

    from warpdemux_tpu.detect.boundaries import (
        _rolling_mean_var_fwd,
        _shift_clamp,
    )
    from warpdemux_tpu.ops.rolling_pallas import rolling_detect_pallas

    rng = np.random.default_rng(41)
    B, L = 6, 2048
    w_mean, w_var, w_run = 200, 500, 100
    svm = 30.0
    x = rng.normal(80, 12, (B, L)).astype(np.float32)
    in_lens = rng.integers(900, L + 1, B).astype(np.int32)
    pos = np.arange(L)[None, :]
    xz = np.where(pos < in_lens[:, None], x, 0.0).astype(np.float32)
    region = (rng.random((B, L)) < 0.5).astype(np.float32)
    thr = rng.uniform(85, 100, B).astype(np.float32)

    m, vf, vw, rsp, rsm = rolling_detect_pallas(
        jnp.asarray(xz), jnp.asarray(region), jnp.asarray(thr),
        jnp.asarray(in_lens), w_mean, w_var, w_run, svm, interpret=True,
    )
    m_want, vf_want = _rolling_mean_var_fwd(jnp.asarray(xz), w_mean)
    _, vw_want = _rolling_mean_var_fwd(jnp.asarray(xz), w_var)
    np.testing.assert_allclose(
        np.asarray(m), np.asarray(m_want), rtol=5e-4, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(vw)[:, : L - w_var],
        np.asarray(vw_want)[:, : L - w_var],
        rtol=3e-3,
        atol=0.1,
    )

    # run-sums: rebuild the masks exactly as detect does FROM THE KERNEL'S
    # OWN mean/var outputs — bit-identical ints required
    valid = pos < in_lens[:, None]
    win_ok = (pos + w_run) <= in_lens[:, None]
    base = (
        (np.asarray(m) > thr[:, None])
        & (np.asarray(vw) < svm)
        & valid
        & win_ok
    )
    for got, mask in ((rsp, base), (rsm, base & (region > 0))):
        z = jnp.zeros((B, 1), jnp.int32)
        cc = jnp.concatenate(
            [z, jnp.cumsum(jnp.asarray(mask, jnp.int32), axis=1)], axis=1
        )
        want = _shift_clamp(cc, w_run) - cc[:, :L]
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
