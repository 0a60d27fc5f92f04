from bliss_gnn_tpu.models.layers import SAGEConv, GraphConv, GATv2Conv  # noqa: F401
from bliss_gnn_tpu.models.gnn import SAGE, GCN, GATv2, build_model  # noqa: F401
