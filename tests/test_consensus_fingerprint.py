"""Parity tests for the tRNA consensus-guided barcode refinement path
(ops/fingerprint.fingerprints_consensus_refined) against a scalar numpy
golden that mirrors the reference algorithm
(warpdemux/sig_proc.py:255-378 + :452-521)."""

import numpy as np
import jax.numpy as jnp
from scipy.signal import find_peaks

from warpdemux_tpu.ops.fingerprint import (
    FingerprintConfig,
    fingerprints_consensus_refined,
)
from warpdemux_tpu.config.sig_proc import SegmentationExtra
from warpdemux_tpu.ops.subsequence import subsequence_dtw_ref
from warpdemux_tpu.models.consensus_data import CONSENSUS

from synth import synth_read


CFG = FingerprintConfig(
    padding=100,
    extract_normalization="none",
    sig_norm_outlier_thresh=5.0,
    max_obs_adapter=6000,
    num_events=120,
    min_obs_per_base=9,
    running_stat_width=18,
    normalization="mean",
    barcode_num_events=25,
    accept_less_cpts=False,
)

# wide gates: every read passes the outlier filter (parity of the fpt values)
SX_WIDE = SegmentationExtra(
    consensus_refinement=True,
    consensus_model="rna004_130bps_v1_0",
    consensus_subseq_match_ub_start=1000,
    consensus_subseq_match_lb_end=0,
    consensus_subseq_match_ub_end=1000,
    barcode_seg_num_events=25,
)
# shipped tRNA gates (rna004_130bps@v1.0_tRNA.toml:26-28)
SX_REAL = SegmentationExtra(
    consensus_refinement=True,
    consensus_model="rna004_130bps_v1_0",
    barcode_seg_num_events=25,
)

QUERY = CONSENSUS["rna004_130bps_v1_0"]


def golden_one(signal, n, a_start, a_end, cfg: FingerprintConfig, sx, query):
    """Reference algorithm, scalar numpy."""
    start = max(0, a_start - cfg.padding)
    end = min(n, a_end + cfg.padding)
    adapter = signal[start:end].astype(np.float64).copy()
    med = np.median(adapter)
    mad = np.median(np.abs(adapter - med))
    np.clip(
        adapter,
        med - cfg.sig_norm_outlier_thresh * mad,
        med + cfg.sig_norm_outlier_thresh * mad,
        out=adapter,
    )
    m = adapter.size
    min_obs = min(cfg.min_obs_per_base, round(m / cfg.num_events / 2))
    w = min(cfg.running_stat_width, round(m / cfg.num_events))
    # windowed t-test (reference _c_segmentation.pyx:124-161)
    scores = np.zeros(m)
    for p in range(m - 2 * w):
        w1 = adapter[p : p + w]
        w2 = adapter[p + w : p + 2 * w]
        v = ((w1 - w1.mean()) ** 2).sum() + ((w2 - w2.mean()) ** 2).sum()
        if v > 0:
            scores[p] = abs(w1.mean() - w2.mean()) / np.sqrt(v)
    n_scores = m - 2 * w
    peaks, _ = find_peaks(scores[:n_scores], distance=min_obs)
    if peaks.size < cfg.num_events:
        return None
    cpts = np.sort(
        peaks[np.argsort(scores[peaks], kind="stable")[-cfg.num_events :]] + w
    )
    cpts = np.concatenate([[0], cpts, [m]])
    dwell = np.diff(cpts)
    means = np.array(
        [adapter[cpts[i] : cpts[i + 1]].mean() for i in range(len(cpts) - 1)]
    )
    norm_series = (means - means.mean()) / means.std()
    st, en_excl, _ = subsequence_dtw_ref(
        query,
        norm_series,
        sx.consensus_subseq_match_penalty,
        sx.consensus_subseq_match_psi,
    )
    en = en_excl - 1  # dtaidistance inclusive endpoint
    sig_bc_start = int(dwell[:en].sum())
    bscores = scores[sig_bc_start:n_scores]
    bpeaks, _ = find_peaks(bscores, distance=cfg.min_obs_per_base)
    if bpeaks.size < sx.barcode_seg_num_events:
        return None
    vc = np.sort(
        bpeaks[
            np.argsort(bscores[bpeaks], kind="stable")[
                -sx.barcode_seg_num_events :
            ]
        ]
        + cfg.running_stat_width
    )
    siglen = bscores.size + 2 * cfg.running_stat_width
    vc = np.concatenate([[0], vc, [siglen]])
    bdwell = np.diff(vc)
    suffix = adapter[sig_bc_start:]
    bmeans = np.array(
        [suffix[vc[i] : vc[i + 1]].mean() for i in range(len(vc) - 1)]
    )
    norm_bc = (bmeans - means.mean()) / means.std()
    outlier = (
        st > sx.consensus_subseq_match_ub_start
        or en < sx.consensus_subseq_match_lb_end
        or en > sx.consensus_subseq_match_ub_end
    )
    k = cfg.barcode_num_events
    return dict(
        fpt=norm_bc[-k:],
        dwell=bdwell[-k:],
        q_start=st,
        q_end=en,
        sig_bc_start=sig_bc_start,
        outlier=outlier,
        ev_mean=means.mean(),
        ev_std=means.std(),
    )


def _batch(rng, B, L=10000):
    sigs = np.zeros((B, L), np.float32)
    lens = np.zeros(B, np.int32)
    a_starts = np.zeros(B, np.int32)
    a_ends = np.zeros(B, np.int32)
    for b in range(B):
        alen = int(rng.integers(2600, 5400))
        sig, truth = synth_read(
            rng, adapter_len=alen, polya_len=int(rng.integers(400, 1500)),
            rna_len=6000,
        )
        n = min(L, sig.size)
        sigs[b, :n] = sig[:n]
        lens[b] = n
        a_starts[b] = truth["adapter_start"]
        a_ends[b] = truth["adapter_end"]
    return sigs, lens, a_starts, a_ends


def test_consensus_refined_matches_golden():
    rng = np.random.default_rng(7)
    B = 6
    sigs, lens, a_starts, a_ends = _batch(rng, B)
    res = fingerprints_consensus_refined(
        jnp.asarray(sigs, jnp.float64),
        jnp.asarray(lens),
        jnp.asarray(a_starts),
        jnp.asarray(a_ends),
        jnp.asarray(QUERY, jnp.float64),
        CFG,
        SX_WIDE,
    )
    n_ok = 0
    for b in range(B):
        g = golden_one(
            sigs[b].astype(np.float64),
            int(lens[b]),
            int(a_starts[b]),
            int(a_ends[b]),
            CFG,
            SX_WIDE,
            QUERY,
        )
        if g is None:
            assert not bool(res.base.ok[b])
            continue
        assert int(res.seg_query_start[b]) == g["q_start"], b
        assert int(res.seg_query_end[b]) == g["q_end"], b
        assert int(res.sig_barcode_start[b]) == g["sig_bc_start"], b
        assert bool(res.outlier[b]) == g["outlier"], b
        if not g["outlier"]:
            assert bool(res.base.ok[b]), b
            np.testing.assert_allclose(
                np.asarray(res.base.fpt[b]), g["fpt"], rtol=1e-8, atol=1e-9
            )
            np.testing.assert_array_equal(
                np.asarray(res.base.dwell[b]), g["dwell"]
            )
            n_ok += 1
    assert n_ok >= 3  # the synthetic batch must exercise the success path


def test_consensus_outlier_gates():
    """With the shipped gate bounds, random-noise adapters whose match lands
    outside [lb_end, ub_end] must fail as 'consensus query outlier'."""
    rng = np.random.default_rng(3)
    B = 4
    sigs, lens, a_starts, a_ends = _batch(rng, B)
    res = fingerprints_consensus_refined(
        jnp.asarray(sigs, jnp.float64),
        jnp.asarray(lens),
        jnp.asarray(a_starts),
        jnp.asarray(a_ends),
        jnp.asarray(QUERY, jnp.float64),
        CFG,
        SX_REAL,
    )
    for b in range(B):
        g = golden_one(
            sigs[b].astype(np.float64),
            int(lens[b]),
            int(a_starts[b]),
            int(a_ends[b]),
            CFG,
            SX_REAL,
            QUERY,
        )
        if g is None:
            assert not bool(res.base.ok[b])
            continue
        assert bool(res.outlier[b]) == g["outlier"], b
        assert bool(res.base.ok[b]) == (not g["outlier"]), b
