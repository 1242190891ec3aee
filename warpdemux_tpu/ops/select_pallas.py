"""Pallas TPU kernel: exact median + MAD of row ranges, x read from HBM once.

The XLA radix-select in ops/select.py re-reads the (B, L) signal from HBM on
every one of its 32 bisection rounds (and again for the MAD). This kernel
keeps an (8, L) row tile resident in VMEM and runs every round — sign pass,
31 bit-building rounds, the upper-middle passes, and the whole MAD search —
as pure VPU work on that tile, for R regions per row in one launch.

Int ordering trick (all plain int32 compares, no uint needed): the map
  key(x) = bits(x) >= 0 ? bits(x) : bits(x) ^ 0x7FFFFFFF
is monotone from float32 total order onto int32 order (negative floats land
on negative ints in increasing order, -0.0 -> -1 < 0 <- +0.0). The k-th
smallest key is found by one sign-deciding count followed by 31 MSB-first
bit-building rounds entirely inside the fixed sign half, where int32
comparison is exact.

Semantics match numpy median over x[b, start:end] (average of the two middle
order statistics, NaN for empty ranges); MAD = median(|x - med|).

Capability parity: the per-read numpy median/MAD statistics of the reference
(warpdemux/sig_proc.py:70-96, :421-431; ADAPTed region stats,
README.md:425-457).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I32_MIN = -(2**31)


def _key32(x):
    i = jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.where(i >= 0, i, i ^ jnp.int32(0x7FFFFFFF))


def _key32_to_float(k):
    i = jnp.where(k >= 0, k, k ^ jnp.int32(0x7FFFFFFF))
    return jax.lax.bitcast_convert_type(i, jnp.float32)


def _rank_select(key, mask, rank):
    """int32 key of the rank-th smallest masked key per row.

    key: (bt, L) int32 keys; mask: (bt, L) bool; rank: (bt, 1) int32.
    All comparisons plain int32. Returns (bt, 1) int32 key.
    """
    kz = jnp.where(mask, key, jnp.int32(2**31 - 1))
    ones = jnp.int32(1)

    # sign pass: answer is negative iff rank < count(key < 0)
    cnt_neg = jnp.sum(
        jnp.where(mask & (key < 0), ones, 0), axis=1, keepdims=True
    )
    res0 = jnp.where(rank < cnt_neg, jnp.int32(_I32_MIN), jnp.int32(0))

    def body(i, res):
        bit = jnp.left_shift(jnp.int32(1), jnp.int32(30) - i)
        t = res | bit
        cnt = jnp.sum(jnp.where(kz < t, ones, 0), axis=1, keepdims=True)
        return jnp.where(cnt <= rank, t, res)

    return jax.lax.fori_loop(0, 31, body, res0)


def _median(key, mask, n):
    """(bt, 1) float32 median from keys; NaN where n == 0."""
    rank_lo = jnp.maximum((n - 1) // 2, 0)
    lo_key = _rank_select(key, mask, rank_lo)
    lo = _key32_to_float(lo_key)
    cnt_le = jnp.sum(
        jnp.where(mask & (key <= lo_key), jnp.int32(1), 0),
        axis=1,
        keepdims=True,
    )
    nxt = jnp.min(
        jnp.where(mask & (key > lo_key), key, jnp.int32(2**31 - 1)),
        axis=1,
        keepdims=True,
    )
    need_next = ((n % 2) == 0) & (cnt_le <= n // 2)
    hi = jnp.where(need_next, _key32_to_float(nxt), lo)
    med = jnp.where((n % 2) == 1, lo, 0.5 * (lo + hi))
    return jnp.where(n > 0, med, jnp.float32(jnp.nan))


def _kernel(R, with_mad, given, x_ref, se_ref, *refs):
    # refs = (gm_ref,) med_ref, mad_ref — gm_ref present iff any(given)
    if any(given):
        gm_ref, med_ref, mad_ref = refs
    else:
        gm_ref, (med_ref, mad_ref) = None, refs
    x = x_ref[...]  # (bt, L) f32
    bt, L = x.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (bt, L), 1)
    key = _key32(x)
    for r in range(R):
        s = se_ref[:, r : r + 1]  # (bt, 1)
        e = se_ref[:, R + r : R + r + 1]
        mask = (pos >= s) & (pos < e)
        n = jnp.sum(jnp.where(mask, jnp.int32(1), 0), axis=1, keepdims=True)
        if given[r]:
            # median already known (e.g. row-selected from an earlier
            # gate-only pass): skip its bisection, search only the MAD
            med = gm_ref[:, r : r + 1]
        else:
            med = _median(key, mask, n)
        med_ref[:, r : r + 1] = med
        if with_mad:
            y = jnp.abs(x - med)
            ykey = _key32(y)
            mad_ref[:, r : r + 1] = _median(ykey, mask, n)


@functools.partial(
    jax.jit, static_argnames=("with_mad", "b_tile", "interpret", "given")
)
def range_median_mad_pallas(
    x: jnp.ndarray,
    starts: jnp.ndarray,
    ends: jnp.ndarray,
    with_mad: bool = True,
    b_tile: int | None = None,
    interpret: bool = False,
    given_meds: jnp.ndarray | None = None,
    given: tuple = (),
):
    """Exact median (+ MAD) over R contiguous ranges per row.

    Args:
      x: (B, L) float32.
      starts, ends: (R, B) int32, clamped to [0, L].
      b_tile: rows per kernel instance. Default: 64 for large batches
        (measured sweep at B=1000, L=10000: 8/16/32/64 ->
        6.1/4.2/4.0/3.5 ms — deeper tiles amortize the per-round scalar
        overhead across 8 sublane registers; 128 exceeds what this
        toolchain compiles), 8 for micro-batches so the pad waste stays
        bounded.
      given_meds: optional (R, B) f32 precomputed medians; given[r]=True
        regions reuse given_meds[r] (passed through to the output) and only
        search the MAD — half the bisection work for regions whose median an
        earlier pass already computed.
    Returns:
      (meds (R, B) f32, mads (R, B) f32 or None).
    """
    B, L = x.shape
    R = starts.shape[0]
    if b_tile is None:
        b_tile = 64 if B >= 64 else 8
    if not given:
        given = (False,) * R
    Bp = -(-B // b_tile) * b_tile
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0)))
        starts = jnp.pad(starts, ((0, 0), (0, Bp - B)))
        ends = jnp.pad(ends, ((0, 0), (0, Bp - B)))
        if given_meds is not None:
            given_meds = jnp.pad(given_meds, ((0, 0), (0, Bp - B)))
    se = jnp.concatenate(
        [
            jnp.clip(starts, 0, L).astype(jnp.int32).T,
            jnp.clip(ends, 0, L).astype(jnp.int32).T,
        ],
        axis=1,
    )  # (Bp, 2R)

    kernel = functools.partial(_kernel, R, with_mad, given)
    grid = (Bp // b_tile,)
    out_shapes = (
        jax.ShapeDtypeStruct((Bp, R), jnp.float32),
        jax.ShapeDtypeStruct((Bp, R), jnp.float32),
    )
    n_med = sum(0 if g else 1 for g in given) + (R if with_mad else 0)
    in_specs = [
        pl.BlockSpec((b_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b_tile, 2 * R), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x.astype(jnp.float32), se]
    if any(given):
        in_specs.append(
            pl.BlockSpec((b_tile, R), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        gm = given_meds if given_meds is not None else jnp.zeros((R, Bp))
        operands.append(gm.astype(jnp.float32).T)
    meds, mads = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((b_tile, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=Bp * L * n_med * 35,
            bytes_accessed=Bp * L * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    meds = meds.T[:, :B]
    return (meds, mads.T[:, :B]) if with_mad else (meds, None)


# ---------------------------------------------------------------------------
# ADC-domain (int16-lattice) medians: half the bisection rounds, bit-exact
# ---------------------------------------------------------------------------
# Calibrated nanopore signal is an affine image of int16 ADC counts,
# x = (float32(adc) + offset) * scale with scale > 0 (pipeline/step.py
# _calibrate_and_detect). f32 rounding keeps that map weakly monotone, so
# the k-th smallest x IS the image of the k-th smallest adc — the median
# bisection runs over a 16-bit integer key (16 rounds instead of the
# float path's sign pass + 31) and the selected order statistics are then
# READ OUT of the calibrated f32 tile itself (min over the matching /
# next-greater ADC key), reproducing the float-path median BIT FOR BIT
# including the even-count 0.5 * (lo + hi) average. (Re-deriving the
# values via the affine instead would be 1-ulp fragile: XLA may or may
# not contract the outer program's add+mul into an FMA.)

_I16_BIAS = 32768  # adc + bias -> [0, 65535]


def _rank_select_i16(kz, rank):
    """int32 key (0..65535; sentinel-masked) of the rank-th smallest."""
    ones = jnp.int32(1)

    def body(i, res):
        bit = jnp.left_shift(ones, jnp.int32(15) - i)
        t = res | bit
        cnt = jnp.sum(jnp.where(kz < t, ones, 0), axis=1, keepdims=True)
        return jnp.where(cnt <= rank, t, res)

    return jax.lax.fori_loop(0, 16, body, jnp.zeros_like(rank))


def _median_i16(x, key, mask, n):
    """(bt, 1) f32 median of x selected via the int16 ADC keys."""
    inf = jnp.float32(jnp.inf)
    kz = jnp.where(mask, key, jnp.int32(1 << 20))
    rank_lo = jnp.maximum((n - 1) // 2, 0)
    lo_key = _rank_select_i16(kz, rank_lo)
    lo = jnp.min(
        jnp.where(mask & (key == lo_key), x, inf), axis=1, keepdims=True
    )
    cnt_le = jnp.sum(
        jnp.where(mask & (key <= lo_key), jnp.int32(1), 0),
        axis=1,
        keepdims=True,
    )
    nxt = jnp.min(
        jnp.where(mask & (key > lo_key), x, inf), axis=1, keepdims=True
    )
    need_next = ((n % 2) == 0) & (cnt_le <= n // 2)
    hi = jnp.where(need_next, nxt, lo)
    med = jnp.where((n % 2) == 1, lo, 0.5 * (lo + hi))
    return jnp.where(n > 0, med, jnp.float32(jnp.nan))


def _kernel_adc(R, x_ref, adc_ref, se_ref, med_ref):
    x = x_ref[...]  # (bt, L) f32 calibrated signal
    a = adc_ref[...]  # (bt, L) int32 ADC counts
    bt, L = a.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (bt, L), 1)
    key = a + jnp.int32(_I16_BIAS)
    for r in range(R):
        st = se_ref[:, r : r + 1]
        en = se_ref[:, R + r : R + r + 1]
        mask = (pos >= st) & (pos < en)
        n = jnp.sum(jnp.where(mask, jnp.int32(1), 0), axis=1, keepdims=True)
        med_ref[:, r : r + 1] = _median_i16(x, key, mask, n)


@functools.partial(jax.jit, static_argnames=("b_tile", "interpret"))
def range_median_pallas_adc(
    x: jnp.ndarray,  # (B, L) f32 calibrated signal
    adc: jnp.ndarray,  # (B, L) int16/int32 ADC counts (x's preimage)
    starts: jnp.ndarray,  # (R, B) int32
    ends: jnp.ndarray,  # (R, B) int32
    b_tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Medians of the calibrated signal over [start, end) row ranges,
    bisected in the 16-bit ADC domain (16 rounds vs the float path's 32).
    Returns (R, B) f32, bit-identical to
    range_median_mad_pallas(x, ..., with_mad=False)."""
    B, L = adc.shape
    R = starts.shape[0]
    if b_tile is None:
        # two (b_tile, L) operand tiles (f32 signal + i32 ADC) live in VMEM
        # at once: 64-row tiles exceed the 16 MB scoped-vmem limit at
        # L=10000 (measured 17.34M), so this kernel tiles half as deep as
        # the float-only one
        b_tile = 32 if B >= 32 else 8
    Bp = -(-B // b_tile) * b_tile
    a = adc.astype(jnp.int32)
    xf = x.astype(jnp.float32)
    if Bp != B:
        a = jnp.pad(a, ((0, Bp - B), (0, 0)))
        xf = jnp.pad(xf, ((0, Bp - B), (0, 0)))
        starts = jnp.pad(starts, ((0, 0), (0, Bp - B)))
        ends = jnp.pad(ends, ((0, 0), (0, Bp - B)))
    se = jnp.concatenate(
        [
            jnp.clip(starts, 0, L).astype(jnp.int32).T,
            jnp.clip(ends, 0, L).astype(jnp.int32).T,
        ],
        axis=1,
    )
    kernel = functools.partial(_kernel_adc, R)
    meds = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, R), jnp.float32),
        grid=(Bp // b_tile,),
        in_specs=[
            pl.BlockSpec(
                (b_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b_tile, 2 * R), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (b_tile, R), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=Bp * L * R * 20,
            bytes_accessed=Bp * L * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, a, se)
    return meds.T[:, :B]
