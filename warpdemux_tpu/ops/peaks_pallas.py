"""Pallas TPU kernel for the peak distance-suppression fixpoint.

ops/peaks.py suppress_by_distance runs scipy's `_select_by_peak_distance`
as a parallel priority-MIS fixpoint. As an XLA while_loop the carried
(B, L) alive/keep masks stream through HBM on every round (~2.6 ms of the
demux step: the while plus its or/and fusions); this kernel runs the whole
fixpoint on a VMEM-resident row tile — rounds cost register rolls and
compares only, and each tile exits as soon as ITS rows converge instead of
the global worst case.

Semantics are identical to the XLA version (same round recurrence, same
tie order: later position wins via the right >= / left > asymmetry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float(-3.4e38)


def _suppress_kernel(W, scores_ref, peaks_ref, dist_ref, keep_ref):
    s = scores_ref[...]  # (bt, L) f32
    bt, L = s.shape
    alive0f = peaks_ref[...]  # (bt, L) f32 0/1 (i8/i1 inputs trip Mosaic
    # relayout bugs on this toolchain; all mask crossings stay f32)
    pos = jax.lax.broadcasted_iota(jnp.int32, (bt, L), 1)
    # full-width per-row distance (Mosaic miscompiles broadcast booleans
    # from (bt, 1) sublane-replicated vectors; int32 add-broadcast is fine)
    df = jnp.zeros((bt, L), jnp.int32) + dist_ref[...][:, :1]

    def shifted(a, o):
        # neighbor value at p+o (o may be negative), NEG outside the row
        v = pltpu.roll(a, (-o) % L, axis=1)
        ok = (pos + o >= 0) & (pos + o < L)
        return jnp.where(ok, v, _NEG)

    def round_fn(state):
        alive, keep = state
        s_alive = jnp.where(alive > 0, s, _NEG)
        dom = jnp.zeros((bt, L), bool)
        for o in range(1, W):
            within = o < df  # (bt, L)
            right = shifted(s_alive, o)
            left = shifted(s_alive, -o)
            dom = dom | (within & (right >= s_alive)) | (
                within & (left > s_alive)
            )
        winner = (alive > 0) & ~dom
        keep = jnp.where(winner, 1.0, keep)
        wf = jnp.where(winner, 1.0, 0.0)
        killed = jnp.zeros((bt, L), bool)
        for o in range(1, W):
            within = o < df
            killed = killed | (
                within & ((shifted(wf, o) > 0) | (shifted(wf, -o) > 0))
            )
        alive = jnp.where(winner | killed, 0.0, alive)
        return alive, keep

    def cond(state):
        return jnp.any(state[0] > 0)

    _, keep = jax.lax.while_loop(
        cond, round_fn, (alive0f, jnp.zeros((bt, L), jnp.float32))
    )
    keep_ref[...] = keep


@functools.partial(
    jax.jit, static_argnames=("max_distance", "b_tile", "interpret")
)
def suppress_by_distance_pallas(
    scores: jnp.ndarray,
    is_peak: jnp.ndarray,
    distance: jnp.ndarray,
    max_distance: int,
    b_tile: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """scipy `_select_by_peak_distance` fixpoint, VMEM-resident per tile.

    Args/semantics identical to ops/peaks.suppress_by_distance. b_tile=16:
    the while body keeps ~18 (b_tile, L) f32 live values on the scoped
    VMEM stack (64 rows OOMs the 16 MB limit at L~6272).
    """
    B, L = scores.shape
    W = max(int(max_distance), 1)
    if B < b_tile:
        b_tile = max(8, -(-B // 8) * 8 // 2 or 8)
        b_tile = min(b_tile, 64)
    Bp = -(-B // b_tile) * b_tile
    if Bp != B:
        scores = jnp.pad(scores, ((0, Bp - B), (0, 0)))
        is_peak = jnp.pad(is_peak, ((0, Bp - B), (0, 0)))
        distance = jnp.pad(distance, (0, Bp - B))
    d2 = jnp.broadcast_to(
        distance.astype(jnp.int32)[:, None], (Bp, 128)
    )

    kernel = functools.partial(_suppress_kernel, W)
    keepf = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, L), jnp.float32),
        grid=(Bp // b_tile,),
        in_specs=[
            pl.BlockSpec((b_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=Bp * L * W * 24,
            bytes_accessed=Bp * L * 12,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        scores.astype(jnp.float32),
        is_peak.astype(jnp.float32),
        d2,
    )
    return keepf[:B] > 0
