"""Pallas TPU kernel for banded DTW distance matrices.

Same dtaidistance-2.3.13 semantics as ops/dtw.py (squared-diff cost, squared
off-diagonal penalty, Sakoe-Chiba band, sqrt at the end) but engineered for
the TPU memory hierarchy: each grid cell computes a (B_TILE x N_TILE) tile of
query-x-reference DTW problems entirely in VMEM.

Layout: the anti-diagonal wavefront state lives as (32, B_TILE*N_TILE) f32 —
diagonal cell index t on sublanes (m=25 rows padded to 32), one DTW problem
per lane. Each of the 2m-1 steps is a handful of VPU element-wise ops:

- cost diagonal d[t] = (q[t] - r[k-t])^2 comes from a *static* sublane roll of
  the reversed reference rows (Wk[t] = rev_r[(m-1-k) + t] = r[k-t]), so no
  dynamic indexing is needed — the python-level loop unrolls with constant
  shifts.
- DP predecessors are sublane rolls of the two previous diagonals.

Inputs are passed pre-transposed (m on sublanes) so the kernel never
transposes: X_T (32, B) query fingerprints, Y_rev_T (32, N) reversed
reference fingerprints.

The reference computes this matrix with C DTW in a process pool
(warpdemux/parallel_distances.py:24-45, :139-198); here a 1000x2601 matrix is
a single kernel launch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_PAD = 32  # sublane-padded fingerprint length (f32 tile: multiples of 8)
_INF = float(np.finfo(np.float32).max) / 4  # python float: jnp scalars here
# would be captured as pallas constants



def _dtw_tile_kernel(m, window, penalty, b_tile, n_tile, xt_ref, yrevt_ref, out_ref):
    p = penalty * penalty
    shape = (M_PAD, b_tile, n_tile)

    # 3D layout: axis 0 = diagonal cell index t (untiled -> axis-0 rolls are
    # cheap register moves), axis 1 = query (sublanes), axis 2 = ref (lanes).
    qT = xt_ref[0]  # (32, b_tile, 1)
    Rrev = yrevt_ref[0]  # (32, 1, n_tile): row t = r[m-1-t]

    t_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    row0 = t_iota == 0
    last_row = t_iota == (m - 1)

    def shift_down_inf(a):
        return jnp.where(row0, _INF, pltpu.roll(a, 1, axis=0))

    diag2 = jnp.full(shape, _INF, jnp.float32)
    diag1 = jnp.full(shape, _INF, jnp.float32)

    for k in range(2 * m - 1):
        # W[t] = r[k-t] via a static roll of the reversed rows; rows outside
        # [max(0,k-m+1), min(k, m-1)] are masked below.
        Wk = pltpu.roll(Rrev, (k - (m - 1)) % M_PAD, axis=0)  # (32, 1, n)
        d = qT - Wk  # (32, b, n)
        d = d * d
        j = k - t_iota
        valid = (
            (j >= 0)
            & (j < m)
            & (t_iota < m)
            & (jnp.abs(t_iota - j) <= (window - 1))
        )
        if k == 0:
            best = 0.0
        else:
            best = jnp.minimum(
                shift_down_inf(diag2),
                jnp.minimum(shift_down_inf(diag1) + p, diag1 + p),
            )
        cur = jnp.where(valid, d + best, _INF)
        diag2, diag1 = diag1, cur

    # D[m-1, m-1] sits on row m-1 of the final diagonal.
    res = jnp.min(jnp.where(last_row, diag1, _INF), axis=0)  # (b, n)
    out_ref[...] = jnp.sqrt(res)


@functools.partial(
    jax.jit,
    static_argnames=("window", "penalty", "b_tile", "n_tile", "interpret"),
)
def dtw_distance_matrix_pallas(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    window: int = 15,
    penalty: float = 0.1,
    b_tile: int = 8,
    n_tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cross DTW distance matrix on TPU via the Pallas wavefront kernel.

    Args:
      X: (B, m) query fingerprints (float32).
      Y: (N, m) reference fingerprints.
    Returns:
      (B, N) float32 distances.
    """
    B, m = X.shape
    N, m2 = Y.shape
    assert m == m2 and m <= M_PAD

    Bp = -(-B // b_tile) * b_tile
    Np = -(-N // n_tile) * n_tile
    Bg, Ng = Bp // b_tile, Np // n_tile

    # Host layouts chosen so blocks satisfy Mosaic's (8, 128) tiling rules
    # without in-kernel transposes:
    #   XT4[g, t, b, 0]   = X[g*b_tile + b, t]
    #   Yrev4[g, t, 0, n] = Y[g*n_tile + n, m-1-t]
    XT = jnp.zeros((M_PAD, Bp), jnp.float32)
    XT = XT.at[:m, :B].set(X.astype(jnp.float32).T)
    XT4 = XT.reshape(M_PAD, Bg, b_tile).transpose(1, 0, 2)[..., None]
    YrevT = jnp.zeros((M_PAD, Np), jnp.float32)
    YrevT = YrevT.at[:m, :N].set(Y.astype(jnp.float32).T[::-1])
    Yrev4 = YrevT.reshape(M_PAD, Ng, n_tile).transpose(1, 0, 2)[:, :, None, :]

    grid = (Bg, Ng)
    kernel = functools.partial(
        _dtw_tile_kernel, m, window, penalty, b_tile, n_tile
    )
    flops_per_tile = (2 * m - 1) * M_PAD * b_tile * n_tile * 8
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, Np), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, M_PAD, b_tile, 1),
                lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, M_PAD, 1, n_tile),
                lambda i, j: (j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (b_tile, n_tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=grid[0] * grid[1] * flops_per_tile,
            bytes_accessed=Bp * Np * 4 + (Bp + Np) * M_PAD * 4,
            transcendentals=Bp * Np,
        ),
        interpret=interpret,
    )(XT4, Yrev4)
    return out[:B, :N]


def dtw_distance_matrix_auto(
    X: jnp.ndarray, Y: jnp.ndarray, window: int = 15, penalty: float = 0.1
) -> jnp.ndarray:
    """Pallas kernel on TPU backends, portable jnp wavefront elsewhere."""
    from warpdemux_tpu.ops.dtw import dtw_distance_matrix

    if jax.default_backend() in ("tpu",):
        return dtw_distance_matrix_pallas(X, Y, window, penalty)
    return dtw_distance_matrix(X, Y, window, penalty)
