"""Boundary-detection validation on the real fixture reads (VERDICT r1 #4).

Runs all three detect methods (llr, cnn, start_peak) over the 800 real
RNA004 reads in /root/reference/test_data/live_balancing/small_pod5_*.pod5,
then reports per-method pass rates, boundary agreement between methods, and
end-to-end barcode-call agreement (cnn vs llr through fingerprint+SVM).
The table goes into STATUS.md; tests/test_real_boundaries.py pins the
numbers. (Reference behavior docs: README.md:336-349, :425-457.)

Usage: python tools/validate_boundaries.py [--limit N]
"""

import argparse
import sys
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

FIXTURES = sorted(
    Path("/root/reference/test_data/live_balancing").glob("small_pod5_*.pod5")
)
L = 10000


def load_real_batches(limit=None, batch=200):
    from warpdemux_tpu.io.pod5 import yield_signal_batches

    out = []
    total = 0
    for f in FIXTURES:
        for sigs, in_lens, full_lens, read_ids in yield_signal_batches(
            [str(f)], None, None, batch_size=batch, preload_size=L
        ):
            out.append((sigs, in_lens, full_lens, read_ids))
            total += len(read_ids)
            if limit and total >= limit:
                return out
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument(
        "--cnn-model", default=None,
        help="override the config's CNN weights (detect/cnn_files/<name>)",
    )
    args = ap.parse_args()

    from warpdemux_tpu.config.utils import get_model_spc_config
    from warpdemux_tpu.detect.boundaries import detect_boundaries_batch
    from warpdemux_tpu.detect import cnn as cnn_mod
    from warpdemux_tpu.models.registry import load_model
    from warpdemux_tpu.ops.fingerprint import fingerprints_from_boundaries
    from warpdemux_tpu.ops.dtw import dtw_distance_matrix
    from warpdemux_tpu.ops import svm as svm_ops

    spc = get_model_spc_config("WDX4_rna004_v1_0")
    dcfg = spc.detect
    fcfg = spc.fingerprint
    model = load_model("WDX4_rna004_v1_0")
    cnn_params = cnn_mod.load_params(args.cnn_model or spc.cnn_model_name)

    cfgs = {
        "llr": (replace(dcfg, method="llr", fallback_to_llr=False), None),
        "cnn": (replace(dcfg, method="cnn", fallback_to_llr=False), cnn_params),
        "start_peak": (
            replace(dcfg, method="start_peak", fallback_to_llr=False),
            None,
        ),
        # the production mRNA path: cnn primary + per-read LLR fallback
        "cnn+fb": (
            replace(dcfg, method="cnn", fallback_to_llr=True),
            cnn_params,
        ),
    }

    batches = load_real_batches(args.limit)
    n_total = sum(len(b[3]) for b in batches)
    print(f"# {n_total} real reads from {len(FIXTURES)} pod5 files")
    full_lens_all = np.concatenate([b[2] for b in batches])

    res = {
        k: {"success": [], "fail": [], "ps": [], "pe": [], "ae": []}
        for k in cfgs
    }
    preds = {}
    from warpdemux_tpu.detect.boundaries import detect_boundaries_with_fallback

    for name, (cfg, params) in cfgs.items():
        pred_rows = []
        for sigs, in_lens, full_lens, read_ids in batches:
            detect_fn = (
                detect_boundaries_with_fallback
                if cfg.fallback_to_llr
                else detect_boundaries_batch
            )
            det = detect_fn(
                jnp.asarray(sigs), jnp.asarray(in_lens), cfg, params
            )
            res[name]["success"].append(np.asarray(det.success))
            res[name]["fail"].append(np.asarray(det.fail_code))
            res[name]["ps"].append(np.asarray(det.polya_start))
            res[name]["pe"].append(np.asarray(det.polya_end))
            res[name]["ae"].append(np.asarray(det.adapter_end))
            if name in ("llr", "cnn", "cnn+fb"):
                fpt = fingerprints_from_boundaries(
                    jnp.asarray(sigs),
                    jnp.asarray(in_lens),
                    det.adapter_start,
                    det.adapter_end,
                    fcfg,
                )
                ok = np.asarray(det.success & fpt.ok)
                f = np.where(ok[:, None], np.asarray(fpt.fpt), 0.0).astype(
                    np.float32
                )
                D = dtw_distance_matrix(
                    jnp.asarray(f), model.X_sv, model.window, model.penalty
                )
                probs = svm_ops.predict_proba(
                    svm_ops.pdist_kernel(D, model.gamma, model.pwr_dist),
                    model.params,
                )
                p, c = svm_ops.process_probs(
                    probs, model.label_map, model.thresholds
                )
                p = np.asarray(p).copy()
                p[~ok] = -2
                pred_rows.append(p)
        if pred_rows:
            preds[name] = np.concatenate(pred_rows)
        for k in ("success", "fail", "ps", "pe", "ae"):
            res[name][k] = np.concatenate(res[name][k])

    print("\n| method | pass rate | notes |")
    print("|---|---|---|")
    for name in cfgs:
        s = res[name]["success"]
        print(f"| {name} | {s.mean():.3f} ({s.sum()}/{len(s)}) | |")

    # ---- per-fail-reason distribution (VERDICT r2 item 5) ----------------
    from warpdemux_tpu.detect.containers import FAIL_REASONS

    print("\n| fail reason | " + " | ".join(cfgs) + " |")
    print("|---|" + "---|" * len(cfgs))
    seen_codes = sorted(
        set(int(c) for name in cfgs for c in np.unique(res[name]["fail"]))
    )
    for code in seen_codes:
        row = [
            str(int((res[name]["fail"] == code).sum())) for name in cfgs
        ]
        label = FAIL_REASONS[code] if code else "(pass)"
        print(f"| {code}: {label} | " + " | ".join(row) + " |")

    # ---- top-bucket investigation: are 'no polyA' reads usable at all? ---
    # The fixture reads are live-captured chunks; a read whose full length
    # barely exceeds its preload may simply end before the adapter->polyA
    # transition was sequenced. Compare the preloaded-signal coverage and
    # level statistics of failing vs passing reads under the llr method.
    fail_llr = res["llr"]["fail"]
    s_llr = res["llr"]["success"]
    print("\n# llr fail diagnostics vs read length")
    print("| group | n | median full_len | median preload trunc? | note |")
    print("|---|---|---|---|---|")
    for label, m in [
        ("pass", s_llr),
        ("no polyA (2)", fail_llr == 2),
        ("mvs failed (5)", fail_llr == 5),
        ("adapter too short (3)", fail_llr == 3),
        ("adapter too long (4)", fail_llr == 4),
    ]:
        if m.sum() == 0:
            continue
        fl = full_lens_all[m]
        print(
            f"| {label} | {m.sum()} | {np.median(fl):.0f} | "
            f"{(fl <= L).mean():.2f} ended within preload | |"
        )

    # polyA-shaped evidence for the no-polyA bucket: does ANY window of the
    # read show the elevated+flat signature at a relaxed variance bound?
    no_pa = fail_llr == 2
    if no_pa.sum():
        sigs_all = np.concatenate([b[0] for b in batches])
        lens_all = np.concatenate([b[1] for b in batches])
        sub = np.where(no_pa)[0]
        relaxed = 0
        for i in sub:
            n = int(lens_all[i])
            x = sigs_all[i, :n]
            if n < 600:
                continue
            w = 200
            c = np.cumsum(np.insert(x.astype(np.float64), 0, 0))
            c2 = np.cumsum(np.insert((x.astype(np.float64)) ** 2, 0, 0))
            mean = (c[w:] - c[:-w]) / w
            var = np.maximum((c2[w:] - c2[:-w]) / w - mean**2, 0)
            med = np.median(x[: min(2000, n)])
            # relaxed contract: 1.15x level, 60 pA^2 variance
            if np.any((mean > 1.15 * med) & (var < 60.0)):
                relaxed += 1
        print(
            f"\n# no-polyA reads with a relaxed-contract polyA-like window: "
            f"{relaxed}/{no_pa.sum()} (rest show no elevated+flat region at "
            f"all -> genuinely unusable for adapter demux)"
        )

    both = res["llr"]["success"] & res["cnn"]["success"]
    d_ps = np.abs(res["cnn"]["ps"][both] - res["llr"]["ps"][both])
    d_ae = np.abs(res["cnn"]["ae"][both] - res["llr"]["ae"][both])
    print(f"\n# cnn vs llr, both-pass reads: {both.sum()}")
    for tol in (10, 50, 200):
        print(
            f"| polya_start within {tol} samples | "
            f"{(d_ps <= tol).mean():.3f} |"
        )
    print(f"| median |polya_start delta| | {np.median(d_ps):.0f} samples |")
    print(f"| median |adapter_end delta| | {np.median(d_ae):.0f} samples |")

    for other in ("cnn", "cnn+fb"):
        pl, pc = preds["llr"], preds[other]
        both_ok = (pl >= -1) & (pc >= -1)
        agree = (pl[both_ok] == pc[both_ok]).mean()
        print(f"\n# barcode-call agreement ({other} vs llr, both fingerprinted):")
        print(f"| agreement | {agree:.4f} ({both_ok.sum()} reads) |")
        hard = (
            (pl[both_ok] != pc[both_ok])
            & (pl[both_ok] >= 0)
            & (pc[both_ok] >= 0)
        ).sum()
        print(
            f"| hard disagreements (different real barcodes, not -1) | "
            f"{hard} |"
        )
    for name in ("llr", "cnn", "cnn+fb"):
        p = preds[name]
        vals, counts = np.unique(p[p >= -1], return_counts=True)
        print(f"| {name} pred distribution | {dict(zip(vals.tolist(), counts.tolist()))} |")


if __name__ == "__main__":
    main()
