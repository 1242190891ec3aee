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


def _suppress_kernel(W, L_real, scores_ref, peaks_ref, dist_ref, keep_ref):
    # Operates on a W-lane NEG/zero border on each side (built by the
    # caller): rolls then read border values instead of wrapped row data,
    # so the per-offset edge-validity masks disappear from the loop body.
    s = scores_ref[...]  # (bt, Lp) f32, NEG in the borders
    bt, Lp = s.shape
    alive0f = peaks_ref[...]  # (bt, Lp) f32 0/1, 0 in the borders
    # (i8/i1 inputs trip Mosaic relayout bugs on this toolchain; all mask
    # crossings stay f32)
    # full-width per-row distance (Mosaic miscompiles broadcast booleans
    # from (bt, 1) sublane-replicated vectors; int32 add-broadcast is fine)
    df = jnp.zeros((bt, Lp), jnp.int32) + dist_ref[...][:, :1]
    # per-offset distance masks are round-invariant: hoist them
    within = [o < df for o in range(1, W)]

    def shifted(a, o):
        return pltpu.roll(a, (-o) % Lp, axis=1)

    def round_fn(state):
        alive, keep = state
        s_alive = jnp.where(alive > 0, s, _NEG)
        dom = jnp.zeros((bt, Lp), bool)
        for o in range(1, W):
            right = shifted(s_alive, o)
            left = shifted(s_alive, -o)
            dom = dom | (
                within[o - 1] & ((right >= s_alive) | (left > s_alive))
            )
        winner = (alive > 0) & ~dom
        keep = jnp.where(winner, 1.0, keep)
        wf = jnp.where(winner, 1.0, 0.0)
        killed = jnp.zeros((bt, Lp), bool)
        for o in range(1, W):
            killed = killed | (
                within[o - 1]
                & ((shifted(wf, o) > 0) | (shifted(wf, -o) > 0))
            )
        alive = jnp.where(winner | killed, 0.0, alive)
        return alive, keep

    def cond(state):
        return jnp.any(state[0] > 0)

    _, keep = jax.lax.while_loop(
        cond, round_fn, (alive0f, jnp.zeros((bt, Lp), jnp.float32))
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
    b_tile: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """scipy `_select_by_peak_distance` fixpoint, VMEM-resident per tile.

    Args/semantics identical to ops/peaks.suppress_by_distance. b_tile=8:
    the while body keeps ~18 (b_tile, L) f32 live values on the scoped
    VMEM stack (64 rows OOMs the 16 MB limit at L~6272); measured on the
    r5 device at (1000, 6272): 8 -> 1.37 ms, 16 -> 1.50, 24 -> 1.46,
    32 -> 1.48 — smaller tiles convergence-exit earlier per tile.
    """
    B, L = scores.shape
    W = max(int(max_distance), 1)
    if B < b_tile:
        b_tile = max(8, -(-B // 8) * 8 // 2 or 8)
        b_tile = min(b_tile, 64)
    Bp = -(-B // b_tile) * b_tile
    # W-lane NEG borders on both sides (right border rounded up so the
    # padded width stays a lane multiple): in-kernel rolls then read
    # border values instead of wrapped row data, so the round loop needs
    # no edge-validity masks
    pad_r = -(-(L + 2 * W) // 128) * 128 - (L + W)
    scores = jnp.pad(
        scores.astype(jnp.float32),
        ((0, Bp - B), (W, pad_r)),
        constant_values=_NEG,
    )
    is_peak = jnp.pad(
        is_peak.astype(jnp.float32), ((0, Bp - B), (W, pad_r))
    )
    distance = jnp.pad(distance, (0, Bp - B))
    Lp = L + W + pad_r
    d2 = jnp.broadcast_to(
        distance.astype(jnp.int32)[:, None], (Bp, 128)
    )

    kernel = functools.partial(_suppress_kernel, W, L)
    keepf = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Lp), jnp.float32),
        grid=(Bp // b_tile,),
        in_specs=[
            pl.BlockSpec((b_tile, Lp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, Lp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b_tile, Lp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=Bp * L * W * 16,
            bytes_accessed=Bp * L * 12,
            transcendentals=0,
        ),
        interpret=interpret,
    )(scores, is_peak, d2)
    return keepf[:B, W : W + L] > 0
