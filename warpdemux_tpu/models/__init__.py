from warpdemux_tpu.models.registry import (
    available_models,
    load_model,
    model_config,
)
from warpdemux_tpu.models.dtw_svm import DTWSVMModel
from warpdemux_tpu.models.dtw_mlp import DTWMLPModel
from warpdemux_tpu.models.fpt_boost import FptBoostModel
