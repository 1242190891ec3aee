"""warpdemux_tpu: TPU-native raw-signal barcode demultiplexing.

A ground-up JAX/XLA/Pallas re-design of the capabilities of KleistLab/WarpDemuX:
adapter detection, event segmentation, DTW fingerprint classification
(precomputed-kernel SVM), offline batch demultiplexing, and live barcode
balancing (adaptive sampling) — engineered for TPU hardware:

- fixed-shape, mask-based batched numerics (no ragged host loops),
- a Pallas anti-diagonal-wavefront kernel for banded DTW distance matrices,
- MXU matmuls for the SVM kernel/decision stage,
- pjit/shard_map data parallelism over device meshes for multi-chip scaling,
- a low-latency micro-batched lane for the live (read-until) path.
"""

__version__ = "0.1.0"
