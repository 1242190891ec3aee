"""Pallas TPU kernel for the windowed t-test score curve.

ops/segmentation.windowed_t_test runs ~70 shifted elementwise passes over
the (B, L) adapter batch (12 window-sum rolls, 12 squared-deviation rolls,
two 12-way dynamic-shift selects). As XLA fusions those stream the batch
through HBM several times (~1.4 ms of the demux step at L=6272); this
kernel runs the identical element DAG on a VMEM-resident row tile, so the
batch crosses HBM exactly twice (read x, write scores).

Numerics: the kernel performs the same f32 operations in the same order
as the jnp path (left-to-right window accumulation, the same where-masks)
— results agree to ~1 ulp (XLA applies context-dependent algebraic
rewrites like x/sqrt(y) -> x*rsqrt(y), so exact bit-parity across program
contexts is not controllable; measured max relative difference 2^-23,
pinned by tests/test_segmentation.py::test_ttest_pallas_matches_jnp).
The jnp path in float64 mode is itself pinned against the reference's
Cython loop (/root/reference/warpdemux/segmentation/_c_segmentation.pyx:124-161).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(w_max, x_ref, nv_ref, w_ref, out_ref):
    x = x_ref[...]  # (bt, L) f32
    bt, L = x.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (bt, L), 1)
    # per-row scalars arrive as (bt, 128) broadcast blocks (Mosaic
    # miscompiles (bt, 1) sublane-replicated broadcasts on this toolchain;
    # int32 column slices are fine — see peaks_pallas.py)
    nv = jnp.zeros((bt, L), jnp.int32) + nv_ref[...][:, :1]
    w = jnp.zeros((bt, L), jnp.int32) + w_ref[...][:, :1]
    wf = w.astype(jnp.float32)

    valid_x = pos < nv
    xz = jnp.where(valid_x, x, 0.0)

    def shifted(arr, k):
        return pltpu.roll(arr, (-k) % L, axis=1)

    s1 = jnp.zeros((bt, L), jnp.float32)
    for idx in range(w_max):
        s1 = s1 + jnp.where(idx < w, shifted(xz, idx), 0.0)
    m1 = s1 / wf

    v1 = jnp.zeros((bt, L), jnp.float32)
    for idx in range(w_max):
        d1 = shifted(xz, idx) - m1
        v1 = v1 + jnp.where(idx < w, d1 * d1, 0.0)

    m2 = jnp.zeros((bt, L), jnp.float32)
    v2 = jnp.zeros((bt, L), jnp.float32)
    for k in range(1, w_max + 1):
        take = w == k
        m2 = jnp.where(take, shifted(m1, k), m2)
        v2 = jnp.where(take, shifted(v1, k), v2)

    n_scores = jnp.maximum(nv - 2 * w, 0)
    in_range = pos < n_scores
    vsum = v1 + v2
    num = jnp.abs(m1 - m2)
    scores = jnp.where(
        vsum > 0, num / jnp.sqrt(jnp.maximum(vsum, 0.0)), 0.0
    )
    out_ref[...] = jnp.where(in_range, scores, 0.0)


@functools.partial(
    jax.jit, static_argnames=("w_max", "b_tile", "interpret")
)
def windowed_t_test_pallas(
    x: jnp.ndarray,
    n_valid: jnp.ndarray,
    w: jnp.ndarray,
    w_max: int,
    b_tile: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """scores of ops/segmentation.windowed_t_test (f32), VMEM-resident.

    Returns only the (B, L) scores; n_scores is trivially recomputed by
    the caller. Agrees with the jnp path to ~1 ulp (see module note).
    """
    B, L = x.shape
    Bp = -(-B // b_tile) * b_tile
    xf = x.astype(jnp.float32)
    nv = n_valid.astype(jnp.int32)
    wi = w.astype(jnp.int32)
    if Bp != B:
        xf = jnp.pad(xf, ((0, Bp - B), (0, 0)))
        nv = jnp.pad(nv, (0, Bp - B))
        wi = jnp.pad(wi, (0, Bp - B), constant_values=1)
    nv2 = jnp.broadcast_to(nv[:, None], (Bp, 128))
    wi2 = jnp.broadcast_to(wi[:, None], (Bp, 128))

    kernel = functools.partial(_kernel, int(w_max))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, L), jnp.float32),
        grid=(Bp // b_tile,),
        in_specs=[
            pl.BlockSpec(
                (b_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (b_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (b_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=Bp * L * (6 * w_max + 10),
            bytes_accessed=Bp * L * 8,
            transcendentals=Bp * L,
        ),
        interpret=interpret,
    )(xf, nv2, wi2)
    return out[:B]
