from warpdemux_tpu.live.caches import ReadCache, AccumulatingCache
from warpdemux_tpu.live.session import Session, ReadObject
from warpdemux_tpu.live.balancer import BarcodeBalancer, BarcodeBalancers
