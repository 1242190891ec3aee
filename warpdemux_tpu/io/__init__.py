from warpdemux_tpu.io.pod5 import Pod5Reader, yield_signal_batches
from warpdemux_tpu.io.writers import (
    save_predictions,
    save_fingerprints,
    save_boundaries,
)
