from warpdemux_tpu.ops.normalize import (
    masked_mean_std,
    masked_median,
    masked_mad,
    mean_normalize,
    mad_normalize,
    normalize,
    normalize_wrt,
    clip_outliers,
)
from warpdemux_tpu.ops.segmentation import (
    windowed_t_test,
    segment_means,
    segment_signal_batch,
)
from warpdemux_tpu.ops.peaks import find_peaks_batch, select_top_peaks
from warpdemux_tpu.ops.dtw import dtw_distance_matrix, dtw_distance_ref
