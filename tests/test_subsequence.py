import numpy as np
import jax.numpy as jnp

from warpdemux_tpu.ops.subsequence import (
    subsequence_dtw_batch,
    subsequence_dtw_ref,
)
from warpdemux_tpu.models.consensus_data import CONSENSUS


def test_consensus_data_shape():
    assert CONSENSUS["rna004_130bps_v1_0"].shape == (84,)


def test_batch_matches_scalar_reference():
    rng = np.random.default_rng(0)
    q = rng.normal(size=20)
    B, C = 5, 40
    series = rng.normal(size=(B, C))
    lens = np.array([40, 35, 40, 28, 40], np.int32)
    psi = (3, 0, 10, 0)
    st, en, dist = subsequence_dtw_batch(
        jnp.asarray(q), jnp.asarray(series), jnp.asarray(lens), 1.5, psi
    )
    for b in range(B):
        s_ref, e_ref, d_ref = subsequence_dtw_ref(
            q, series[b, : lens[b]], 1.5, psi
        )
        assert int(en[b]) == e_ref, (b, int(en[b]), e_ref)
        assert int(st[b]) == s_ref, (b, int(st[b]), s_ref)
        assert np.isclose(float(dist[b]), d_ref, rtol=1e-5)


def test_embedded_query_found():
    # Embed a scaled copy of the consensus inside a noisy series: the matched
    # segment must cover the embedding.
    rng = np.random.default_rng(1)
    q = CONSENSUS["rna004_130bps_v1_0"]
    m = len(q)
    B, C = 3, 121
    series = rng.normal(0, 1.0, size=(B, C))
    offsets = [5, 20, 0]
    for b, off in enumerate(offsets):
        series[b, off : off + m] = q + rng.normal(0, 0.05, m)
    lens = np.full(B, C, np.int32)
    st, en, dist = subsequence_dtw_batch(
        jnp.asarray(q), jnp.asarray(series), jnp.asarray(lens), 1.5, (5, 0, 40, 0)
    )
    for b, off in enumerate(offsets):
        assert abs(int(st[b]) - off) <= 5, (b, int(st[b]), off)
        assert abs(int(en[b]) - (off + m)) <= 6, (b, int(en[b]), off + m)
        assert float(dist[b]) < 0.5


def test_reference_impl_psi_relaxation():
    # With psi_2b large the query can match anywhere; with psi_2b=0 it must
    # start at the series start.
    rng = np.random.default_rng(2)
    q = rng.normal(size=10)
    series = np.concatenate([rng.normal(size=15), q])
    s_rel, e_rel, d_rel = subsequence_dtw_ref(q, series, 0.1, (0, 0, 20, 0))
    assert d_rel < 0.1 and s_rel >= 13
    s0, e0, d0 = subsequence_dtw_ref(q, series, 0.1, (0, 0, 0, 0))
    assert d0 > d_rel
