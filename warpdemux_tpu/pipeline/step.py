"""The fused per-minibatch device step: raw signal -> barcode predictions.

The reference splits this across a process pool (ADAPTed detect -> per-read
fingerprint loops -> dtaidistance DTW -> sklearn SVC; call stack
SURVEY/file_proc.py:380-454). Here the whole chain is ONE jitted XLA program
per minibatch:

    detect_boundaries_batch -> fingerprints_from_boundaries
        -> dtw (Pallas on TPU) -> exp kernel -> SVM proba -> postproc

One device dispatch per minibatch with small outputs keeps the host<->device
path off the critical path and is what the multi-chip runtime shards.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from warpdemux_tpu.detect.boundaries import detect_boundaries_with_fallback
from warpdemux_tpu.detect.containers import DetectArrays
from warpdemux_tpu.ops.fingerprint import (
    ConsensusFingerprintArrays,
    FingerprintArrays,
    fingerprints_consensus_refined,
    fingerprints_from_boundaries,
)
from warpdemux_tpu.ops import svm as svm_ops
from warpdemux_tpu.config.sig_proc import SigProcConfig


class DemuxStepOutput(NamedTuple):
    detect: DetectArrays
    fpt: FingerprintArrays
    fail_code: jnp.ndarray  # (B,) int32: merged detect+fingerprint taxonomy
    success: jnp.ndarray  # (B,) bool
    pred: jnp.ndarray  # (B,) int32 barcode (-1 noise; only valid if success)
    conf: jnp.ndarray  # (B,)
    probs: jnp.ndarray  # (B, k)
    consensus: ConsensusFingerprintArrays | None = None  # tRNA path only


def make_demux_step(
    model,
    spc: SigProcConfig,
    with_predict: bool = True,
    input_format: str = "pa",
    mesh=None,
):
    """Build the demux step function.

    input_format:
      "pa":  step(signals (B, L) f32 picoamps, in_lens (B,))
      "adc": step(adc (B, L) int16, offset (B,) f32, scale (B,) f32,
             in_lens (B,)) — the TPU-native feed: raw pod5 ADC counts cross
             the host->device link (half the bytes of f32) and the exact
             calibration (adc + offset) * scale runs on device, fused into
             the detect dispatch.
      "vbz": step(keys (B, L/8) u8, data (B, D) u8, offset, scale,
             in_lens) — the compressed wire: the pod5 VBZ inner layout
             (~11.5 KB/read vs 20 KB int16) crosses the link and the TPU
             decodes it (ops/vbz_device); D varies per batch (bounded
             ladder of compile variants for the small decode program).

    `model` is a DTWSVMModel (or None for prep-only runs).

    The chain runs as three separately-jitted dispatches (detect ->
    fingerprint -> classify) with all intermediates staying on device.
    Fusing the whole chain into one XLA program compiles fine functionally
    but makes this environment's remote TPU compiler take minutes and
    behave erratically (4-25x the per-stage compile time); three stable
    ~10s compiles with device-resident handoffs cost only dispatch latency,
    which pipelining across minibatches hides.

    `mesh`: optional jax.sharding.Mesh — each stage is shard_map'd over the
    mesh's first axis (minibatch rows sharded, model arrays replicated; the
    TPU-native analog of the reference's reads-parallel process pool,
    file_proc.py:1197-1245). Minibatches must be padded to a multiple of
    the mesh size; outputs come back batch-sharded and are fetched whole.
    """
    dcfg, fcfg = spc.detect, spc.fingerprint

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        _axis = mesh.axis_names[0]
        _row = P(_axis)  # prefix spec: shard dim 0, replicate the rest

        def _wrap(fn, n_in, out_specs):
            return jax.jit(
                jax.shard_map(
                    fn,
                    mesh=mesh,
                    in_specs=(_row,) * n_in,
                    out_specs=out_specs,
                    check_vma=False,
                )
            )

    else:
        _row = None

        def _wrap(fn, n_in, out_specs):
            return jax.jit(fn)
    cnn_params = None
    if dcfg.method == "cnn":
        from warpdemux_tpu.detect import cnn as cnn_mod

        cnn_params = cnn_mod.load_params(spc.cnn_model_name)

    if with_predict and model is not None:
        use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from warpdemux_tpu.ops.dtw_pallas import dtw_distance_matrix_pallas

            dtw_fn = functools.partial(
                dtw_distance_matrix_pallas,
                window=model.window,
                penalty=model.penalty,
            )
        else:
            from warpdemux_tpu.ops.dtw import dtw_distance_matrix

            dtw_fn = functools.partial(
                dtw_distance_matrix,
                window=model.window,
                penalty=model.penalty,
            )
        X_sv, params = model.X_sv, model.params
        label_map, thresholds = model.label_map, model.thresholds
        gamma, pwr = model.gamma, model.pwr_dist

        def _classify(fpts, success):
            fpts_safe = jnp.where(success[:, None], fpts, 0.0).astype(
                jnp.float32
            )
            D = dtw_fn(fpts_safe, X_sv)
            K = svm_ops.pdist_kernel(D, gamma, pwr)
            probs = svm_ops.predict_proba(K, params)
            pred, conf = svm_ops.process_probs(probs, label_map, thresholds)
            return pred, conf, probs

        classify = _wrap(_classify, 2, (_row, _row, _row))

    def _merge_fail(det_fail, fpt_ok, outlier):
        # detect failures win; then "consensus query outlier" (13); any other
        # fingerprint failure is "event segmentation failed" (10)
        fail = jnp.where(
            (det_fail == 0) & outlier,
            jnp.int32(13),
            jnp.where((det_fail == 0) & ~fpt_ok, jnp.int32(10), det_fail),
        )
        return fail, fail == 0

    merge_fail = _wrap(_merge_fail, 3, (_row, _row))

    refine = spc.seg_extra.consensus_refinement
    if refine:
        from warpdemux_tpu.models.consensus_data import CONSENSUS

        query = jnp.asarray(
            CONSENSUS[spc.seg_extra.consensus_model], jnp.float32
        )
        seg_extra = spc.seg_extra

    if input_format in ("adc", "vbz"):

        def _calibrate_and_detect(adc, offset, scale, in_lens):
            signals = (adc.astype(jnp.float32) + offset[:, None]) * scale[
                :, None
            ]
            return (
                detect_boundaries_with_fallback(
                    signals, in_lens, dcfg, cnn_params
                ),
                signals,
            )

        calibrate_and_detect = _wrap(_calibrate_and_detect, 4, (_row, _row))

    detect_only = _wrap(
        lambda signals, in_lens: detect_boundaries_with_fallback(
            signals, in_lens, dcfg, cnn_params
        ),
        2,
        _row,
    )

    fingerprint_std = _wrap(
        lambda signals, in_lens, a0, a1: fingerprints_from_boundaries(
            signals, in_lens, a0, a1, fcfg
        ),
        4,
        _row,
    )
    if refine:
        fingerprint_cons = _wrap(
            lambda signals, in_lens, a0, a1: fingerprints_consensus_refined(
                signals, in_lens, a0, a1, query, fcfg, seg_extra
            ),
            4,
            _row,
        )

    if input_format == "vbz":
        from warpdemux_tpu.ops.vbz_device import vbz_decode_batch

        decode = _wrap(
            lambda keys, data: vbz_decode_batch(
                keys, data, keys.shape[1] * 8
            ).astype(jnp.int16),
            2,
            _row,
        )

    def step(*args):
        if input_format == "vbz":
            keys, data, offset, scale, in_lens = args
            in_lens = jnp.asarray(in_lens, jnp.int32)
            adc = decode(
                jnp.asarray(keys, jnp.uint8), jnp.asarray(data, jnp.uint8)
            )
            det, signals = calibrate_and_detect(
                adc,
                jnp.asarray(offset, jnp.float32),
                jnp.asarray(scale, jnp.float32),
                in_lens,
            )
        elif input_format == "adc":
            adc, offset, scale, in_lens = args
            in_lens = jnp.asarray(in_lens, jnp.int32)
            det, signals = calibrate_and_detect(
                jnp.asarray(adc, jnp.int16),
                jnp.asarray(offset, jnp.float32),
                jnp.asarray(scale, jnp.float32),
                in_lens,
            )
        else:
            signals, in_lens = args
            signals = jnp.asarray(signals, jnp.float32)
            in_lens = jnp.asarray(in_lens, jnp.int32)
            det = detect_only(signals, in_lens)
        if refine:
            cons = fingerprint_cons(
                signals, in_lens, det.adapter_start, det.adapter_end
            )
            fpt = cons.base
            outlier = cons.outlier
        else:
            cons = None
            fpt = fingerprint_std(
                signals, in_lens, det.adapter_start, det.adapter_end
            )
            outlier = jnp.zeros(signals.shape[0], bool)
        fail, success = merge_fail(det.fail_code, fpt.ok, outlier)

        if with_predict and model is not None:
            pred, conf, probs = classify(fpt.fpt, success)
        else:
            B = signals.shape[0]
            pred = jnp.full(B, -1, jnp.int32)
            conf = jnp.zeros(B, jnp.float32)
            probs = jnp.zeros((B, 1), jnp.float32)

        return DemuxStepOutput(
            detect=det,
            fpt=fpt,
            fail_code=fail,
            success=success,
            pred=pred,
            conf=conf,
            probs=probs,
            consensus=cons,
        )

    return step
