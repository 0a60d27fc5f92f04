from bliss_gnn_tpu.graph.structure import Graph, DeviceGraph  # noqa: F401
from bliss_gnn_tpu.graph.datasets import load_dataset, toy_graph  # noqa: F401
