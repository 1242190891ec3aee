import numpy as np
import jax.numpy as jnp

from warpdemux_tpu.ops.normalize import (
    masked_mean_std,
    masked_median,
    masked_mad,
    mean_normalize,
    mad_normalize,
    normalize_wrt,
    clip_outliers,
)


def _rand_batch(rng, B=7, L=64):
    x = rng.normal(90.0, 10.0, size=(B, L))
    n = rng.integers(5, L + 1, size=B)
    mask = np.arange(L)[None, :] < n[:, None]
    return x, mask, n


def test_masked_median_matches_numpy():
    rng = np.random.default_rng(0)
    x, mask, n = _rand_batch(rng)
    got = np.asarray(masked_median(jnp.asarray(x), jnp.asarray(mask)))
    for b in range(x.shape[0]):
        assert np.isclose(got[b], np.median(x[b, : n[b]]))


def test_masked_mad_matches_numpy():
    rng = np.random.default_rng(1)
    x, mask, n = _rand_batch(rng)
    got = np.asarray(masked_mad(jnp.asarray(x), jnp.asarray(mask)))
    for b in range(x.shape[0]):
        v = x[b, : n[b]]
        med = np.median(v)
        assert np.isclose(got[b], np.median(np.abs(v - med)))


def test_masked_mean_std():
    rng = np.random.default_rng(2)
    x, mask, n = _rand_batch(rng)
    mean, std = masked_mean_std(jnp.asarray(x), jnp.asarray(mask))
    for b in range(x.shape[0]):
        v = x[b, : n[b]]
        assert np.isclose(float(mean[b]), v.mean())
        assert np.isclose(float(std[b]), v.std())


def test_mean_normalize_matches_reference_semantics():
    rng = np.random.default_rng(3)
    x, mask, n = _rand_batch(rng)
    got = np.asarray(mean_normalize(jnp.asarray(x), jnp.asarray(mask)))
    for b in range(x.shape[0]):
        v = x[b, : n[b]]
        want = (v - v.mean()) / v.std()
        np.testing.assert_allclose(got[b, : n[b]], want, rtol=1e-9)


def test_mad_normalize_matches_reference_semantics():
    rng = np.random.default_rng(4)
    x, mask, n = _rand_batch(rng)
    got = np.asarray(mad_normalize(jnp.asarray(x), jnp.asarray(mask)))
    for b in range(x.shape[0]):
        v = x[b, : n[b]]
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        np.testing.assert_allclose(got[b, : n[b]], (v - med) / mad, rtol=1e-12)


def test_normalize_wrt():
    rng = np.random.default_rng(5)
    ref = rng.normal(size=(3, 40))
    tn = rng.normal(size=(3, 25))
    mask = np.ones((3, 40), bool)
    got = np.asarray(
        normalize_wrt(jnp.asarray(tn), jnp.asarray(ref), jnp.asarray(mask), "mean")
    )
    for b in range(3):
        want = (tn[b] - ref[b].mean()) / ref[b].std()
        np.testing.assert_allclose(got[b], want, rtol=1e-12)


def test_clip_outliers():
    rng = np.random.default_rng(6)
    x, mask, n = _rand_batch(rng)
    x[:, 3] = 1e5  # an outlier in every row
    got = np.asarray(clip_outliers(jnp.asarray(x), jnp.asarray(mask), 5.0))
    for b in range(x.shape[0]):
        v = x[b, : n[b]]
        med = np.median(v)
        mad = np.median(np.abs(v - med))
        want = np.clip(v, med - 5.0 * mad, med + 5.0 * mad)
        np.testing.assert_allclose(got[b, : n[b]], want, rtol=1e-12)
