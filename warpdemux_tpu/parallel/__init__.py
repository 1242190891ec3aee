from warpdemux_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_demux_step,
    class_counts_psum,
)
