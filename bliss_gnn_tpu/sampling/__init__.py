from bliss_gnn_tpu.sampling.block import Block, CapacityPlan  # noqa: F401
from bliss_gnn_tpu.sampling.samplers import (  # noqa: F401
    SamplerConfig,
    sample_blocks,
    exp3_row,
    init_exp3_weights,
    exp3_update,
)
