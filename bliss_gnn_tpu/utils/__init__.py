from bliss_gnn_tpu.utils.logging import MetricLogger  # noqa: F401
