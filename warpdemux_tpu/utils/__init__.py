from warpdemux_tpu.utils import synthetic  # noqa: F401
