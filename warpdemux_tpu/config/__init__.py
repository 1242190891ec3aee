from warpdemux_tpu.config.sig_proc import SigProcConfig
from warpdemux_tpu.config.config import (
    Config,
    InputConfig,
    OutputConfig,
    BatchConfig,
    TaskConfig,
)
from warpdemux_tpu.config.utils import (
    load_chemistry_config,
    get_model_spc_config,
    apply_overrides,
)
