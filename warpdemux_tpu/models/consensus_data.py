"""Consensus adapter signals (model data).

The mean-normalized 84-event consensus of the constant RNA004 sequencing-
adapter region, used to locate the barcode start in segmented tRNA adapters
(subsequence DTW; reference data asset warpdemux/_consensus.py:11-100,
consumed at sig_proc.py:288-331). These are trained/derived signal values
(data, not code), reproduced for capability parity.
"""

import numpy as np

CONSENSUS = {
    "rna004_130bps_v1_0": np.array([
        -1.5183, -1.8727, -1.9543, -1.9302, -1.8015, -1.6293, -1.0795,
        1.2055, 1.4142, 2.7910, 3.0117, 3.1124, 1.3108, 0.1161, 0.0464,
        -0.0383, -0.1137, -0.1224, -0.1762, -0.2305, -0.2356, -0.2878,
        -1.1652, 0.9497, -0.0844, -0.2241, -0.3000, -0.3241, -0.3042,
        -0.2528, -0.2289, -0.2457, -1.9121, -0.6398, -0.3237, -0.3340,
        -0.4090, -0.8197, -1.0163, -1.3572, -1.5977, -1.7627, -1.9416,
        0.4983, -1.4384, -0.0037, 0.2078, 0.2972, 0.1884, 0.1117, 0.0596,
        0.0223, -0.0145, -0.0300, -0.0020, 0.0167, 0.0310, 0.0985, 0.7983,
        0.8181, 0.6753, 0.5921, -0.7926, 1.3769, 1.0878, 0.8852, 0.9476,
        0.1551, 0.4764, 0.0895, -0.1273, -0.2631, 1.1313, 0.4736, 0.3932,
        0.2558, -0.4511, -0.6029, -0.7543, -1.5670, -1.9172, -0.1928,
        0.0437, -0.6502,
    ]),
}
