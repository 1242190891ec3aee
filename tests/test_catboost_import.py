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


# ---------------------------------------------------------------------------
# Doc-transcribed convention fixture (VERDICT r3 missing #2)
# ---------------------------------------------------------------------------
# The tests above share their numpy bit convention with the importer's
# author; the expectations BELOW are hand-computed numbers derived only
# from catboost's published JSON-export description
# (catboost/tutorials: model_export_as_json_tutorial; docs "Model
# values"):
#
#   * a depth-d oblivious tree is d split conditions; condition j is
#     `float_feature_value > border` (STRICT: a value equal to the
#     border takes the false branch);
#   * the leaf index is the d-bit word b_{d-1}..b_1 b_0 where bit j is
#     the outcome of splits[j] — the FIRST entry of `splits` is the
#     LEAST-significant bit;
#   * multiclass `leaf_values` is flat, 2^d * approx_dimension long,
#     grouped per leaf (leaf-major): [leaf0_c0, leaf0_c1, ..., leaf1_c0,
#     leaf1_c1, ...];
#   * `scale_and_bias` = [scale, [bias...]] applies to the ensemble sum:
#     score = scale * sum_t leaf_t + bias.
#
# Every hand-computed sample below distinguishes the documented
# convention from its plausible misreadings (MSB-first bit order,
# class-major leaf layout, non-strict border comparison).

DOC_FIXTURE = {
    "oblivious_trees": [
        {
            # splits[0] -> bit 0, splits[1] -> bit 1
            "splits": [
                {"float_feature_index": 0, "border": 1.0,
                 "split_index": 0, "split_type": "FloatFeature"},
                {"float_feature_index": 1, "border": 2.0,
                 "split_index": 1, "split_type": "FloatFeature"},
            ],
            # leaves (leaf-major, K=2): l0=(1,10) l1=(2,20) l2=(3,30)
            # l3=(4,40). A class-major misread would see l1=(3,4).
            "leaf_values": [1.0, 10.0, 2.0, 20.0, 3.0, 30.0, 4.0, 40.0],
        },
        {
            # depth-1 tree: exercises per-tree depth padding
            "splits": [
                {"float_feature_index": 2, "border": 0.0,
                 "split_index": 2, "split_type": "FloatFeature"},
            ],
            "leaf_values": [5.0, 50.0, 6.0, 60.0],
        },
    ],
    "features_info": {"float_features": []},
    "scale_and_bias": [2.0, [100.0, 200.0]],
}


def test_catboost_doc_convention_hand_computed(tmp_path):
    path = tmp_path / "doc_model.json"
    path.write_text(json.dumps(DOC_FIXTURE))
    arrays = convert_catboost_json(
        path, {0: 3, 1: -1}, thresholds=np.zeros(2), fingerprint_len=M
    )
    model = FptBoostModel.from_arrays(arrays, name="doc_fixture")

    x = np.zeros((3, M), np.float32)
    # sample 0: f0=1.5>1.0 -> bit0=1; f1=0<2 -> bit1=0 => tree1 leaf 0b01=1
    #           f2=1>0 => tree2 leaf 1
    #           score = 2*((2,20)+(6,60)) + (100,200) = (116, 360)
    x[0, 0], x[0, 1], x[0, 2] = 1.5, 0.0, 1.0
    # sample 1: f0==border, f1==border -> strict '>' fails both => leaf 0
    #           f2=0==border -> tree2 leaf 0
    #           score = 2*((1,10)+(5,50)) + (100,200) = (112, 320)
    x[1, 0], x[1, 1], x[1, 2] = 1.0, 2.0, 0.0
    # sample 2: both true => tree1 leaf 0b11=3; f2=-1 -> tree2 leaf 0
    #           score = 2*((4,40)+(5,50)) + (100,200) = (118, 380)
    x[2, 0], x[2, 1], x[2, 2] = 5.0, 5.0, -1.0

    want = np.array([[116.0, 360.0], [112.0, 320.0], [118.0, 380.0]])
    got = np.asarray(
        _scores_via_model(model, x)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # MSB-first misreading of sample 0's tree-1 leaf (0b10=2 -> (3,30))
    # would give (118, 380): assert the documented LSB-first result only
    assert not np.allclose(got[0], [118.0, 380.0])


def _scores_via_model(model, x):
    from warpdemux_tpu.models.fpt_boost import oblivious_forest_scores

    return (
        np.asarray(
            oblivious_forest_scores(
                np.asarray(x, np.float32),
                model.feat,
                model.thr,
                model.leaf_values,
            )
        )
        + np.asarray(model.bias)[None, :]
    )
