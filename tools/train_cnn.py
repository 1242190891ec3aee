"""Train the CNN boundary-proposal network on synthetic RNA004 squiggles.

The reference ships torch CNN weights inside its (absent) ADAPTed
submodule; this trainer produces our own weights for
warpdemux_tpu/detect/cnn.py from the synthetic generator with known
ground-truth boundaries. Per-position 3-class labels on the downscaled
grid: 0=adapter, 1=polyA, 2=RNA (positions past the read end are masked
out of the loss).

Usage:  python tools/train_cnn.py [--steps 400] [--out NAME]
Writes  warpdemux_tpu/detect/cnn_files/<NAME>.npz
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from warpdemux_tpu.detect import cnn
from warpdemux_tpu.utils.synthetic import synth_read

DS = 10
L = 10000


def make_batch(rng, B):
    """Varied synthetic reads + per-ds-position labels (-1 = masked)."""
    sigs = np.zeros((B, L), np.float32)
    lens = np.zeros(B, np.int32)
    labels = np.full((B, L // DS), -1, np.int32)
    for b in range(B):
        has_polya = rng.random() < 0.8
        adapter_len = int(rng.integers(2200, 5800))
        polya_len = int(rng.integers(600, 3200)) if has_polya else 0
        open_pore = int(rng.integers(0, 300)) if rng.random() < 0.2 else 0
        adapter_level = float(rng.normal(75, 6))
        polya_level = adapter_level * float(rng.uniform(1.32, 1.55))
        rna_level = adapter_level * float(rng.uniform(1.1, 1.45))
        sig, truth = synth_read(
            rng,
            adapter_len=adapter_len,
            polya_len=polya_len,
            rna_len=int(rng.integers(2000, 9000)),
            adapter_level=adapter_level,
            polya_level=polya_level,
            rna_level=rna_level,
            open_pore_len=open_pore,
            noise=float(rng.uniform(1.2, 2.6)),
            adapter_spread=float(rng.uniform(8, 14)),
        )
        n = min(L, sig.size)
        sigs[b, :n] = sig[:n]
        lens[b] = n
        g = np.arange(L // DS) * DS
        lab = np.where(
            g < truth["polya_start"],
            0,
            np.where(g < truth["polya_end"], 1, 2),
        )
        if not has_polya:
            lab = np.where(g < truth["adapter_end"], 0, 2)
        lab[g >= n] = -1
        labels[b] = lab
    return sigs, lens, labels


def load_real_labeled(limit=None, max_obs_adapter=None):
    """Real fixture reads labeled by the LLR detector (VERDICT r1 #4).

    LLR is the reference's most sensitive method and its fallback target
    (README.md:336-349); reads it fails are masked out entirely. With
    `max_obs_adapter` raised past the contract default (6000), the
    long-adapter population the contract rejects still yields training
    labels (573 vs 364 labeled reads at 9000; STATUS r3) — the CNN is a
    boundary PROPOSER, the contract gates re-apply the bound at detect
    time. Returns (sigs, lens, labels) like make_batch.
    """
    from dataclasses import replace
    from pathlib import Path as P

    import jax.numpy as jnp

    from warpdemux_tpu.config.utils import get_model_spc_config
    from warpdemux_tpu.detect.boundaries import detect_boundaries_batch
    from warpdemux_tpu.io.pod5 import yield_signal_batches

    dcfg = replace(
        get_model_spc_config("WDX4_rna004_v1_0").detect,
        method="llr",
        fallback_to_llr=False,
    )
    if max_obs_adapter:
        dcfg = replace(dcfg, max_obs_adapter=max_obs_adapter)
    fixtures = sorted(
        P("/root/reference/test_data/live_balancing").glob("small_pod5_*.pod5")
    )
    all_s, all_n, all_l = [], [], []
    for f in fixtures:
        for sigs, in_lens, _fl, _ids in yield_signal_batches(
            [str(f)], None, None, batch_size=200, preload_size=L
        ):
            det = detect_boundaries_batch(
                jnp.asarray(sigs), jnp.asarray(in_lens), dcfg
            )
            ok = np.asarray(det.success)
            ps = np.asarray(det.polya_start)
            pe = np.asarray(det.polya_end)
            g = np.arange(L // DS)[None, :] * DS
            lab = np.where(
                g < ps[:, None], 0, np.where(g < pe[:, None], 1, 2)
            ).astype(np.int32)
            lab[g >= in_lens[:, None]] = -1
            lab[~ok] = -1
            all_s.append(sigs[ok])
            all_n.append(in_lens[ok])
            all_l.append(lab[ok])
    s = np.concatenate(all_s)
    n = np.concatenate(all_n)
    l = np.concatenate(all_l)
    if limit:
        s, n, l = s[:limit], n[:limit], l[:limit]
    return s, n, l


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="rna004_cnn_synth_v1")
    ap.add_argument(
        "--real-frac", type=float, default=0.0,
        help="fraction of each batch drawn from LLR-labeled real fixture "
             "reads (0 = synthetic only)",
    )
    ap.add_argument(
        "--real-max-adapter", type=int, default=0,
        help="label real reads with this max_obs_adapter bound (0 = the "
             "contract default 6000; 9000 recovers the long-adapter "
             "population as extra training labels)",
    )
    ap.add_argument(
        "--wide", action="store_true",
        help="ARCH_WIDE: dilations to 32 (~3.8k-sample receptive field)",
    )
    ap.add_argument(
        "--input-cap", type=int, default=7168,
        help="train with the production prefix cap (DetectConfig."
             "cnn_input_cap): input zeroed, validity and labels masked past "
             "the cap. 0 = full-window (legacy v1-v3 weights)",
    )
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    real = None
    if args.real_frac > 0:
        real = load_real_labeled(
            max_obs_adapter=args.real_max_adapter or None
        )
        print(f"loaded {len(real[0])} LLR-labeled real reads")
    params = cnn.init_params(
        rng, arch=cnn.ARCH_WIDE if args.wide else cnn.ARCH
    )
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    cap = args.input_cap

    def capped(x, lens):
        """Mirror detect/boundaries.py's prefix-causal CNN input."""
        if not cap:
            return x, lens
        pos = jnp.arange(x.shape[1])[None, :]
        return jnp.where(pos < cap, x, 0.0), jnp.minimum(lens, cap)

    @jax.jit
    def loss_fn(params, x, lens, labels):
        xn, _valid = cnn.preprocess(*capped(x, lens), DS)
        logits = cnn.apply(params, xn)
        mask = labels >= 0
        if cap:
            lane = jnp.arange(labels.shape[1])[None, :]
            mask = mask & (lane * DS < cap)
        lab = jnp.maximum(labels, 0)
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, lab)
        acc = jnp.sum(
            jnp.where(mask & (jnp.argmax(logits, -1) == lab), 1.0, 0.0)
        ) / jnp.maximum(jnp.sum(mask), 1)
        return jnp.sum(jnp.where(mask, ce, 0.0)) / jnp.maximum(
            jnp.sum(mask), 1
        ), acc

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    @jax.jit
    def update(params, opt_state, x, lens, labels):
        (loss, acc), grads = grad_fn(params, x, lens, labels)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    for step in range(args.steps):
        sigs, lens, labels = make_batch(rng, args.batch)
        if real is not None:
            k = int(round(args.real_frac * args.batch))
            if k:
                idx = rng.integers(0, len(real[0]), k)
                sigs[:k] = real[0][idx]
                lens[:k] = real[1][idx]
                labels[:k] = real[2][idx]
        params, opt_state, loss, acc = update(
            params, opt_state, jnp.asarray(sigs), jnp.asarray(lens),
            jnp.asarray(labels),
        )
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.4f} acc {float(acc):.4f}")

    out = cnn.CNN_DIR / f"{args.out}.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    cnn.save_params(params, out)
    print(f"saved {out}")

    # quick candidate-quality eval
    sigs, lens, labels = make_batch(rng, 64)
    xn, valid = cnn.preprocess(
        *capped(jnp.asarray(sigs), jnp.asarray(lens)), DS
    )
    logits = cnn.apply(params, xn)
    starts, lens_k = cnn.polya_candidates_from_logits(logits, valid, 5)
    has_pa = np.array([(l == 1).any() for l in np.asarray(labels)])
    true_start = np.array(
        [
            int(np.argmax(l == 1)) if h else -1
            for l, h in zip(np.asarray(labels), has_pa)
        ]
    )
    top = np.asarray(starts)[:, 0]
    err = np.abs(top - true_start)[has_pa]
    print(
        f"eval: polyA reads {has_pa.sum()}/64, top-candidate start err "
        f"median {np.median(err):.1f} ds (p90 {np.percentile(err, 90):.1f})"
    )


if __name__ == "__main__":
    main()
