"""Tests for the DTW_MLP and Fpt_Boost model families against scalar numpy
goldens (reference classes warpdemux/models/dtw_mlp.py:44-93 and
models/fpt_boost.py:12-50)."""

import numpy as np
import jax.numpy as jnp

from warpdemux_tpu.models.dtw_mlp import DTWMLPModel, mlp_predict_proba
from warpdemux_tpu.models.fpt_boost import (
    FptBoostModel,
    oblivious_forest_scores,
)


def _softmax(z):
    e = np.exp(z - z.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def test_mlp_predict_proba_matches_numpy():
    rng = np.random.default_rng(0)
    B, n_ref, h, k = 7, 40, 16, 4
    D = rng.normal(size=(B, n_ref))
    W0, b0 = rng.normal(size=(n_ref, h)), rng.normal(size=h)
    W1, b1 = rng.normal(size=(h, k)), rng.normal(size=k)
    sm, ss = rng.normal(size=n_ref), rng.uniform(0.5, 2, n_ref)

    probs = np.asarray(
        mlp_predict_proba(
            jnp.asarray(D),
            (jnp.asarray(W0), jnp.asarray(W1)),
            (jnp.asarray(b0), jnp.asarray(b1)),
            jnp.asarray(sm),
            jnp.asarray(ss),
        )
    )
    hidden = np.maximum((D - sm) / ss @ W0 + b0, 0)
    ref = _softmax(hidden @ W1 + b1)
    np.testing.assert_allclose(probs, ref, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-6)


def test_mlp_model_end_to_end():
    rng = np.random.default_rng(1)
    n_ref, m, h, k = 30, 25, 8, 3
    arrays = dict(
        X_sv=rng.normal(size=(n_ref, m)).astype(np.float32),
        n_layers=2,
        mlp_w0=rng.normal(size=(n_ref, h)).astype(np.float32),
        mlp_b0=rng.normal(size=h).astype(np.float32),
        mlp_w1=rng.normal(size=(h, k)).astype(np.float32),
        mlp_b1=rng.normal(size=k).astype(np.float32),
        label_map=np.array([3, 5, -1], np.int32),
        thresholds=np.zeros(k, np.float32),
        window=15,
        penalty=0.1,
    )
    model = DTWMLPModel.from_arrays(arrays, name="test_mlp")
    fpts = rng.normal(size=(5, m)).astype(np.float32)
    pred, conf, probs = model.predict(fpts)
    assert pred.shape == (5,)
    assert set(np.unique(pred)) <= {3, 5, -1}
    assert probs.shape == (5, k)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    # confidence = top1 - top2 (models/utils.py:19-23)
    s = np.sort(probs, axis=1)
    np.testing.assert_allclose(conf, s[:, -1] - s[:, -2], rtol=1e-5, atol=1e-6)


def _golden_forest(x, feat, thr, leaf):
    B = x.shape[0]
    T, d = feat.shape
    out = np.zeros((B, leaf.shape[-1]))
    for b in range(B):
        for t in range(T):
            idx = 0
            for j in range(d):
                if x[b, feat[t, j]] > thr[t, j]:
                    idx |= 1 << j
            out[b] += leaf[t, idx]
    return out


def test_oblivious_forest_matches_golden():
    rng = np.random.default_rng(2)
    B, m, T, d, k = 6, 25, 12, 4, 5
    x = rng.normal(size=(B, m)).astype(np.float32)
    feat = rng.integers(0, m, size=(T, d)).astype(np.int32)
    thr = rng.normal(size=(T, d)).astype(np.float32)
    leaf = rng.normal(size=(T, 2**d, k)).astype(np.float32)
    scores = np.asarray(
        oblivious_forest_scores(
            jnp.asarray(x), jnp.asarray(feat), jnp.asarray(thr),
            jnp.asarray(leaf),
        )
    )
    ref = _golden_forest(x, feat, thr, leaf)
    np.testing.assert_allclose(scores, ref, rtol=1e-5, atol=1e-5)


def test_fpt_boost_model_end_to_end():
    rng = np.random.default_rng(3)
    m, T, d, k = 25, 20, 3, 4
    arrays = dict(
        feat=rng.integers(0, m, size=(T, d)).astype(np.int32),
        thr=rng.normal(size=(T, d)).astype(np.float32),
        leaf_values=rng.normal(size=(T, 2**d, k)).astype(np.float32),
        label_map=np.array([4, 5, 7, -1], np.int32),
        thresholds=np.array([0.2, 0.2, 0.2, 1.01], np.float32),
        fingerprint_len=m,
        model_type="fpt_boost",
    )
    model = FptBoostModel.from_arrays(arrays, name="test_boost")
    fpts = rng.normal(size=(8, m)).astype(np.float32)
    pred, conf, probs = model.predict(fpts)
    assert probs.shape == (8, k)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    # below-threshold confidence must map to -1 (models/utils.py:45-61)
    below = conf < np.array([0.2, 0.2, 0.2, 1.01])[
        np.argmax(probs, axis=1)
    ]
    assert (pred[below] == -1).all()
