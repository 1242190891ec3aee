from warpdemux_tpu.detect.containers import (
    DetectArrays,
    FAIL_REASONS,
    fail_code_to_reason,
)
from warpdemux_tpu.detect.boundaries import detect_boundaries_batch
