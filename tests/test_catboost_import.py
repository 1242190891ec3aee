"""catboost-JSON -> Fpt_Boost import path (SURVEY 2.1.5 / 2.6).

catboost itself is not installed here (nor does the reference ship a
catboost artifact — the tRNA joblibs are missing blobs), so this builds a
model file in catboost's documented JSON export schema by hand and checks
the imported FptBoostModel against an INDEPENDENT per-sample tree-walk
evaluator (plain Python loops over splits — no shared code with the
vectorized oblivious-forest math in models/fpt_boost.py)."""

import json

import numpy as np
import pytest

from warpdemux_tpu.models.fpt_boost import FptBoostModel
from warpdemux_tpu.models.importer import convert_catboost_json

K = 3  # classes
M = 25  # fingerprint length


def _make_json_model(rng, n_trees=12, max_depth=4):
    trees = []
    for _ in range(n_trees):
        d = int(rng.integers(2, max_depth + 1))
        splits = [
            {
                "float_feature_index": int(rng.integers(0, M)),
                "border": float(rng.normal(0, 1)),
                "split_index": 0,
                "split_type": "FloatFeature",
            }
            for _ in range(d)
        ]
        leaf_values = rng.normal(0, 0.5, size=(2**d) * K).tolist()
        trees.append({"splits": splits, "leaf_values": leaf_values})
    return {
        "oblivious_trees": trees,
        "features_info": {"float_features": []},
        "scale_and_bias": [1.25, [0.1, -0.2, 0.05]],
    }


def _tree_walk_scores(doc, x):
    """Independent evaluator: per-sample, per-tree Python walk."""
    scale, bias = doc["scale_and_bias"]
    scores = np.tile(np.asarray(bias, np.float64), (len(x), 1))
    for t in doc["oblivious_trees"]:
        d = len(t["splits"])
        lv = np.asarray(t["leaf_values"], np.float64).reshape(2**d, -1)
        for b in range(len(x)):
            idx = 0
            for j, s in enumerate(t["splits"]):
                if x[b, s["float_feature_index"]] > s["border"]:
                    idx |= 1 << j
            scores[b] += scale * lv[idx]
    return scores


def test_catboost_json_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    doc = _make_json_model(rng)
    path = tmp_path / "model.json"
    path.write_text(json.dumps(doc))

    label_mapper = {0: 3, 1: 4, 2: -1}
    arrays = convert_catboost_json(
        path, label_mapper, thresholds=np.zeros(K), fingerprint_len=M
    )
    assert str(arrays["model_type"]) == "fpt_boost"
    model = FptBoostModel.from_arrays(arrays, name="cb_test")

    x = rng.normal(0, 1, (64, M)).astype(np.float32)
    want_scores = _tree_walk_scores(doc, x)
    want_probs = np.exp(want_scores) / np.exp(want_scores).sum(
        axis=1, keepdims=True
    )
    pred, conf, probs = model.predict(x)
    np.testing.assert_allclose(probs, want_probs, rtol=2e-5, atol=2e-6)
    want_pred = np.array(
        [label_mapper[int(i)] for i in want_scores.argmax(axis=1)]
    )
    np.testing.assert_array_equal(pred, want_pred)


def test_catboost_json_registry_load(tmp_path, monkeypatch):
    """A converted bundle saved under model_files loads through the
    registry's model_type dispatch."""
    rng = np.random.default_rng(1)
    doc = _make_json_model(rng, n_trees=4, max_depth=3)
    path = tmp_path / "m.json"
    path.write_text(json.dumps(doc))
    arrays = convert_catboost_json(
        path, {0: 1, 1: 2, 2: -1}, thresholds=np.zeros(K), fingerprint_len=M
    )
    import warpdemux_tpu.models.registry as reg

    np.savez_compressed(tmp_path / "CB_TEST.npz", **arrays)
    monkeypatch.setattr(reg, "MODEL_DIR", tmp_path)
    model = reg.load_model("CB_TEST")
    assert isinstance(model, FptBoostModel)
    pred, conf, probs = model.predict(rng.normal(0, 1, (4, M)))
    assert probs.shape == (4, K)
