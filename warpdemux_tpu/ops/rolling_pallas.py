"""Pallas TPU kernels for forward rolling-window statistics.

detect/boundaries.py computes forward rolling mean/variance and
sustained-run lengths with length-L cumsums; XLA lowers each cumsum into
a multi-pass reduce-window pipeline plus layout copies (~1.5 ms of the
demux step at L=10000). These kernels run the scans on a VMEM-resident
row tile (log2(L) doubling rounds of in-register lane rolls), so each
batch crosses HBM once per input/output.

Numerics: the doubling-scan (Hillis-Steele) f32 cumsum associates
differently than XLA's reduce-window lowering, so rolling means/vars can
differ from the jnp path by the usual prefix-sum rounding (~|c|*2^-24
per element — the same error class both lowerings carry). The integer
run-sum kernel is exact, hence bit-identical. Capability parity:
the reference's ADAPTed rolling gates (README.md:425-457).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cumsum_lanes(a):
    """Inclusive cumsum along lanes via doubling rounds (in-VMEM)."""
    bt, L = a.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (bt, L), 1)
    k = 1
    while k < L:
        shifted = pltpu.roll(a, k, axis=1)
        a = a + jnp.where(pos >= k, shifted, jnp.zeros_like(a))
        k *= 2
    return a


def _window_sum(c, w, pos, zero):
    """sum x[t : min(t+w, L)) from the inclusive cumsum c."""
    bt, L = c.shape
    w = min(int(w), L)
    c_last = jnp.zeros_like(c) + c[:, L - 1 : L]
    hi = pltpu.roll(c, (-(w - 1)) % L, axis=1) if w > 1 else c
    hi = jnp.where(pos > L - w, c_last, hi)
    lo = jnp.where(pos == 0, zero, pltpu.roll(c, 1, axis=1))
    return hi - lo


def _mean_var_kernel(w_mean, w_var, x_ref, mean_ref, varf_ref, varw_ref):
    x = x_ref[...]  # (bt, L) f32, already validity-zeroed by the caller
    bt, L = x.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (bt, L), 1)
    zero = jnp.zeros((bt, L), jnp.float32)
    c1 = _cumsum_lanes(x)
    c2 = _cumsum_lanes(x * x)

    def mean_var(w):
        n = (jnp.minimum(pos + w, L) - pos).astype(jnp.float32)
        s1 = _window_sum(c1, w, pos, zero)
        s2 = _window_sum(c2, w, pos, zero)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        return mean, var

    mean_f, var_f = mean_var(w_mean)
    _, var_w = mean_var(w_var)
    mean_ref[...] = mean_f
    varf_ref[...] = var_f
    varw_ref[...] = var_w


@functools.partial(
    jax.jit, static_argnames=("w_mean", "w_var", "b_tile", "interpret")
)
def rolling_mean_var_pallas(
    x: jnp.ndarray,
    w_mean: int,
    w_var: int,
    b_tile: int = 24,  # 16 -> 32 measured ~1.9x standalone, but 32 needs 16.78M scoped VMEM in-step (limit 16M); 24 fits
    interpret: bool = False,
):
    """(mean[w_mean], var[w_mean], var[w_var]) forward rolling stats.

    Same window semantics as detect/boundaries._rolling_mean_var_fwd
    (window [t, min(t+w, L)), shrinking at the tail).
    """
    B, L = x.shape
    Bp = -(-B // b_tile) * b_tile
    xf = x.astype(jnp.float32)
    if Bp != B:
        xf = jnp.pad(xf, ((0, Bp - B), (0, 0)))
    kernel = functools.partial(_mean_var_kernel, int(w_mean), int(w_var))
    spec = pl.BlockSpec((b_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((Bp, L), jnp.float32)
    mean_f, var_f, var_w = pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape, out_shape),
        grid=(Bp // b_tile,),
        in_specs=[spec],
        out_specs=(spec, spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=Bp * L * 80,
            bytes_accessed=Bp * L * 16,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf)
    return mean_f[:B], var_f[:B], var_w[:B]


def _run_sum_kernel(w, m_ref, out_ref):
    m = m_ref[...]  # (bt, L) i32 0/1
    bt, L = m.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (bt, L), 1)
    zero = jnp.zeros((bt, L), jnp.int32)
    c = _cumsum_lanes(m)
    out_ref[...] = _window_sum(c, w, pos, zero)


@functools.partial(jax.jit, static_argnames=("w", "b_tile", "interpret"))
def rolling_run_sum_pallas(
    mask: jnp.ndarray,
    w: int,
    b_tile: int = 32,  # same cumsum structure as the mean/var kernel
    interpret: bool = False,
) -> jnp.ndarray:
    """sum of mask over [t, min(t+w, L)) per position — int32, exact.

    Equivalent to the cumsum + _shift_clamp difference in
    detect/boundaries.py (sustained-run detection), bit-identical.
    """
    B, L = mask.shape
    Bp = -(-B // b_tile) * b_tile
    mi = mask.astype(jnp.int32)
    if Bp != B:
        mi = jnp.pad(mi, ((0, Bp - B), (0, 0)))
    kernel = functools.partial(_run_sum_kernel, int(w))
    spec = pl.BlockSpec((b_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, L), jnp.int32),
        grid=(Bp // b_tile,),
        in_specs=[spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=Bp * L * 30,
            bytes_accessed=Bp * L * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(mi)
    return out[:B]


def _detect_stats_kernel(
    w_mean, w_var, w_run, svm_max,
    x_ref, region_ref, thr_ref, len_ref,
    mean_ref, varf_ref, varw_ref, rsp_ref, rsm_ref,
):
    x = x_ref[...]  # (bt, L) f32, validity-zeroed
    bt, L = x.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (bt, L), 1)
    zero = jnp.zeros((bt, L), jnp.float32)
    c1 = _cumsum_lanes(x)
    c2 = _cumsum_lanes(x * x)

    def mean_var(w):
        n = (jnp.minimum(pos + w, L) - pos).astype(jnp.float32)
        s1 = _window_sum(c1, w, pos, zero)
        s2 = _window_sum(c2, w, pos, zero)
        mean = s1 / n
        var = jnp.maximum(s2 / n - mean * mean, 0.0)
        return mean, var

    mean_f, var_f = mean_var(w_mean)
    _, var_w = mean_var(w_var)
    mean_ref[...] = mean_f
    varf_ref[...] = var_f
    varw_ref[...] = var_w

    # the poly(A) candidate mask, exactly as detect/boundaries.py builds
    # it from the kernel's own outputs (f32 HBM round trips are exact, so
    # in-VMEM comparison == XLA-side comparison bit for bit)
    n_valid = jnp.zeros((bt, L), jnp.int32) + len_ref[...][:, :1]
    thr = jnp.zeros((bt, L), jnp.float32) + thr_ref[...][:, :1]
    base = (
        (mean_f > thr)
        & (var_w < svm_max)
        & (pos < n_valid)
        & (pos + w_run <= n_valid)
    )
    zi = jnp.zeros((bt, L), jnp.int32)
    cp = _cumsum_lanes(jnp.where(base, 1, 0))
    rsp_ref[...] = _window_sum(cp, w_run, pos, zi)
    cm = _cumsum_lanes(jnp.where(base & (region_ref[...] > 0), 1, 0))
    rsm_ref[...] = _window_sum(cm, w_run, pos, zi)


@functools.partial(
    jax.jit,
    static_argnames=("w_mean", "w_var", "w_run", "svm_max", "b_tile",
                     "interpret"),
)
def rolling_detect_pallas(
    x: jnp.ndarray,
    region: jnp.ndarray,  # (B, L) f32 0/1 CNN region prior (ones if none)
    thr: jnp.ndarray,  # (B,) f32 per-row candidate level threshold
    in_lens: jnp.ndarray,  # (B,) i32
    w_mean: int,
    w_var: int,
    w_run: int,
    svm_max: float,
    b_tile: int = 16,
    interpret: bool = False,
):
    """Fused rolling stats + candidate run-sums for the detect stage.

    One VMEM-resident launch produces (mean[w_mean], var[w_mean],
    var[w_var]) AND the two sustained-run sums the cnn+llr fallback pair
    consumes — rs_plain over the raw elevated+flat candidate mask and
    rs_masked over (mask & region) — so the candidate masks never
    materialize in HBM and the two rolling_run_sum launches disappear.
    The masks are rebuilt in-kernel from the kernel's own mean/var values
    (f32 round trips are exact), keeping every downstream comparison
    bit-identical to the unfused path; pinned by
    tests/test_detect.py::test_rolling_detect_fused_matches_unfused.
    """
    B, L = x.shape
    Bp = -(-B // b_tile) * b_tile
    xf = x.astype(jnp.float32)
    rf = region.astype(jnp.float32)
    if Bp != B:
        xf = jnp.pad(xf, ((0, Bp - B), (0, 0)))
        rf = jnp.pad(rf, ((0, Bp - B), (0, 0)))
    thr2 = jnp.broadcast_to(
        thr.astype(jnp.float32)[:, None], (B, 128)
    )
    len2 = jnp.broadcast_to(
        in_lens.astype(jnp.int32)[:, None], (B, 128)
    )
    if Bp != B:
        thr2 = jnp.pad(thr2, ((0, Bp - B), (0, 0)))
        len2 = jnp.pad(len2, ((0, Bp - B), (0, 0)))
    kernel = functools.partial(
        _detect_stats_kernel, int(w_mean), int(w_var), int(w_run),
        float(svm_max),
    )
    spec = pl.BlockSpec((b_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    spec128 = pl.BlockSpec(
        (b_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    outf = jax.ShapeDtypeStruct((Bp, L), jnp.float32)
    outi = jax.ShapeDtypeStruct((Bp, L), jnp.int32)
    mean_f, var_f, var_w, rsp, rsm = pl.pallas_call(
        kernel,
        out_shape=(outf, outf, outf, outi, outi),
        grid=(Bp // b_tile,),
        in_specs=[spec, spec, spec128, spec128],
        out_specs=(spec, spec, spec, spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=Bp * L * 140,
            bytes_accessed=Bp * L * 28,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, rf, thr2, len2)
    return mean_f[:B], var_f[:B], var_w[:B], rsp[:B], rsm[:B]
