"""On-device (non-interpret) parity check for the rolling Pallas kernels.

The production demux step runs rolling_mean_var_pallas / rolling_run_sum_pallas
through the real Mosaic lowering at L=10000 — NOT a multiple of 128 lanes —
while the in-suite parity tests run in interpret mode (which bypasses Mosaic).
This script executes both kernels on the attached TPU at the production length
and at a deliberately awkward non-lane-multiple length, compares against the
jnp cumsum reference (computed in f64 on host), and exits nonzero on mismatch.
tests/test_detect.py::test_rolling_kernels_on_device runs it under the
WDX_TPU_TESTS gate. (ADVICE r4: interpret-mode-only parity left the Mosaic
lowering of pltpu.roll at non-128-multiple L unverified.)

Usage: python tools/check_rolling_device.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def ref_mean_var(x64, w):
    """f64 host reference of _rolling_mean_var_fwd semantics."""
    B, L = x64.shape
    z = np.zeros((B, 1))
    c1 = np.concatenate([z, np.cumsum(x64, axis=1)], axis=1)
    c2 = np.concatenate([z, np.cumsum(x64 * x64, axis=1)], axis=1)
    hi = np.minimum(np.arange(L) + w, L)
    s1 = c1[:, hi] - c1[:, :L]
    s2 = c2[:, hi] - c2[:, :L]
    n = (hi - np.arange(L)).astype(np.float64)
    mean = s1 / n
    var = np.maximum(s2 / n - mean * mean, 0.0)
    return mean, var


def main():
    import jax
    import jax.numpy as jnp

    from warpdemux_tpu.ops.rolling_pallas import (
        rolling_mean_var_pallas,
        rolling_run_sum_pallas,
    )

    if jax.default_backend() not in ("tpu", "axon"):
        sys.exit(f"needs a TPU backend, got {jax.default_backend()}")

    rng = np.random.default_rng(7)
    failures = []
    # production length (10000 = 78.125 * 128) and an awkward odd length
    for B, L in ((48, 10000), (33, 4444)):
        x = rng.normal(80, 12, (B, L)).astype(np.float32)
        xj = jnp.asarray(x)
        m, vf, vw = jax.device_get(rolling_mean_var_pallas(xj, 200, 500))
        m_want, vf_want = ref_mean_var(x.astype(np.float64), 200)
        _, vw_want = ref_mean_var(x.astype(np.float64), 500)
        # f32 cumsum-difference vs f64 reference. Full windows: relative.
        # Shrinking tail windows (the last w positions): the error of BOTH
        # lowerings is ulp(full-row cumsum)/n amplified by the scan depth —
        # measured on this device at L=10000: Pallas max 36, XLA's own f32
        # lowering max 10.5, both at n=1 where ulp(c2) ~ 7.6. The bound
        # below (24 * eps * max|c2| / n) separates that rounding class from
        # a miscompile (garbage values, wrong offsets) by ~2 orders of
        # magnitude. Gate-relevant positions (win_ok needs n >= 100) sit
        # at <= ~0.7 absolute error vs a 30 pA^2 threshold.
        c2_max = float(np.max(np.cumsum(x.astype(np.float64) ** 2, axis=1)))
        eps = np.finfo(np.float32).eps
        checks = [
            ("mean", m, m_want, 200, 5e-4, 0.05),
            ("var_f", vf, vf_want, 200, 3e-3, 0.1),
            ("var_w", vw, vw_want, 500, 3e-3, 0.1),
        ]
        for name, got, want, w, rtol, atol in checks:
            body_bad = ~np.isclose(
                got[:, : L - w], want[:, : L - w], rtol=rtol, atol=atol
            )
            n_tail = (L - np.arange(L - w, L)).astype(np.float64)
            tail_tol = np.maximum(24.0 * eps * c2_max / n_tail, atol)
            tail_bad = (
                np.abs(got[:, L - w :] - want[:, L - w :]) > tail_tol[None, :]
            )
            if body_bad.any() or tail_bad.any():
                failures.append(
                    f"L={L} {name}: {int(body_bad.sum())} body / "
                    f"{int(tail_bad.sum())} tail mismatches; max body err "
                    f"{np.abs(got[:, : L - w] - want[:, : L - w]).max():.3e}"
                )

        mask = rng.random((B, L)) < 0.4
        got_rs = np.asarray(
            jax.device_get(rolling_run_sum_pallas(jnp.asarray(mask), 100))
        )
        c = np.concatenate(
            [np.zeros((B, 1), np.int64), np.cumsum(mask, axis=1)], axis=1
        )
        hi = np.minimum(np.arange(L) + 100, L)
        want_rs = (c[:, hi] - c[:, :L]).astype(np.int32)
        if not np.array_equal(got_rs, want_rs):
            bad = int((got_rs != want_rs).sum())
            failures.append(f"L={L} run_sum: {bad} int mismatches (must be exact)")

    if failures:
        print("FAIL\n" + "\n".join(failures))
        sys.exit(1)
    print("OK: rolling kernels bit-checked on device at L=10000 and L=4444")


if __name__ == "__main__":
    main()
