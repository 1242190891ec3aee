"""Shim: the synthetic squiggle generator lives in the package so the CNN
trainer (tools/train_cnn.py) and tests share one implementation."""

from warpdemux_tpu.utils.synthetic import (  # noqa: F401
    synth_batch,
    synth_read,
    synth_trna_read,
)
