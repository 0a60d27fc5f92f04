from bliss_gnn_tpu.ops.segment import (  # noqa: F401
    masked_segment_sum,
    masked_segment_max,
    copy_e_sum,
    gather_u,
    gather_v,
    u_mul_e_sum,
    edge_softmax,
    segment_mean,
)
