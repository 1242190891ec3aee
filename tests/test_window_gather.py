import numpy as np
import jax.numpy as jnp

from warpdemux_tpu.ops.window_gather import shift_rows, shift_rows_auto


def test_shift_rows_interpret_matches_numpy():
    rng = np.random.default_rng(0)
    B, L, A = 13, 500, 128
    x = rng.normal(size=(B, L)).astype(np.float32)
    starts = rng.integers(0, L - A + 1, size=B).astype(np.int32)
    got = np.asarray(
        shift_rows(jnp.asarray(x), jnp.asarray(starts), A, interpret=True)
    )
    for b in range(B):
        np.testing.assert_array_equal(got[b], x[b, starts[b] : starts[b] + A])


def test_shift_rows_auto_cpu_path():
    rng = np.random.default_rng(1)
    B, L, A = 5, 300, 64
    x = rng.normal(size=(B, L)).astype(np.float32)
    starts = rng.integers(0, L - A + 1, size=B).astype(np.int32)
    got = np.asarray(shift_rows_auto(jnp.asarray(x), jnp.asarray(starts), A))
    for b in range(B):
        np.testing.assert_array_equal(got[b], x[b, starts[b] : starts[b] + A])
