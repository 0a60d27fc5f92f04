from bliss_gnn_tpu.parallel.mesh import make_mesh  # noqa: F401
from bliss_gnn_tpu.parallel.dp import make_dp_train_step  # noqa: F401
