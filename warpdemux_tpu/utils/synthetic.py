"""Synthetic RNA004-style squiggle generator with known ground-truth
boundaries — used by detect/pipeline tests and CNN training."""

import numpy as np


def synth_read(
    rng,
    adapter_len=4000,
    polya_len=2000,
    rna_len=8000,
    adapter_level=75.0,
    polya_level=105.0,
    rna_level=95.0,
    open_pore_len=0,
    event_len=(15, 60),
    noise=1.8,
    adapter_spread=12.0,
):
    """Returns (signal_pa f32, truth dict)."""
    parts = []
    if open_pore_len:
        parts.append(np.full(open_pore_len, 220.0) + rng.normal(0, 2, open_pore_len))
    def events(total, level, spread):
        seg = []
        while sum(map(len, seg)) < total:
            seg.append(np.full(rng.integers(*event_len), level + rng.normal(0, spread)))
        return np.concatenate(seg)[:total] if seg else np.zeros(0)

    # adapter: event-structured, wide level range (high variance region)
    if adapter_len:
        parts.append(events(adapter_len, adapter_level, adapter_spread))
    # polyA: flat elevated
    if polya_len:
        parts.append(np.full(polya_len, polya_level) + rng.normal(0, 1.0, polya_len))
    # RNA: event-structured around rna_level
    if rna_len:
        parts.append(events(rna_len, rna_level, 14))
    sig = np.concatenate(parts).astype(np.float32)
    sig += rng.normal(0, noise, sig.size).astype(np.float32)
    a0 = open_pore_len
    truth = dict(
        adapter_start=a0,
        adapter_end=a0 + adapter_len,
        polya_start=a0 + adapter_len,
        polya_end=a0 + adapter_len + polya_len,
    )
    return sig, truth


def synth_trna_read(
    rng,
    adapter_len=3000,
    polya_len=0,
    trna_len=2500,
    spike_idx=300,
    spike_height=110.0,
    adapter_level=68.0,
    polya_level=100.0,
    trna_level=92.0,
    noise=1.8,
    adapter_spread=4.0,
):
    """tRNA-style read: capture spike near the head, adapter, optional short
    polyA, structured tRNA body. The adapter stays below the
    min_start_peak_pa spike threshold (83 pA), as real RNA004 adapters do.
    Returns (signal f32, truth dict)."""
    sig, truth = synth_read(
        rng,
        adapter_len=adapter_len,
        polya_len=polya_len,
        rna_len=trna_len,
        adapter_level=adapter_level,
        polya_level=polya_level,
        rna_level=trna_level,
        noise=noise,
        adapter_spread=adapter_spread,
    )
    if spike_idx is not None:
        w = 40
        s = max(0, spike_idx - w // 2)
        sig[s : s + w] = spike_height + rng.normal(0, 2, min(w, sig.size - s))
        truth["spike_idx"] = spike_idx
    return sig, truth


def synth_batch(rng, B, L=10000, **kw):
    sigs = np.zeros((B, L), np.float32)
    lens = np.zeros(B, np.int32)
    truths = []
    for b in range(B):
        adapter_len = int(rng.integers(2500, 5500))
        polya_len = int(rng.integers(500, 3000))
        sig, truth = synth_read(rng, adapter_len=adapter_len, polya_len=polya_len, **kw)
        n = min(L, sig.size)
        sigs[b, :n] = sig[:n]
        lens[b] = n
        truths.append(truth)
    return sigs, lens, truths
