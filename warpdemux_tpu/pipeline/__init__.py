from warpdemux_tpu.pipeline.step import make_demux_step, DemuxStepOutput
from warpdemux_tpu.pipeline.run import run_demux
