"""bliss_gnn_tpu — a TPU-native GNN training framework.

A from-scratch JAX/XLA/Pallas implementation of layer-wise importance-sampled
GNN minibatch training with the capability surface of BLISS-GNN (bandit
layer importance sampling, LADIES samplers, SAGE/GCN/GATv2 models), designed
for TPU: static shapes, fused jitted sampling + training steps, device meshes.

Subpackages
-----------
- ``graph``    — CSR/CSC graph container, canonicalization, datasets
- ``ops``      — sparse segment ops (SpMM / SDDMM / edge softmax), Pallas kernels
- ``sampling`` — layer-wise importance samplers as pure jitted functions
- ``models``   — SAGE / GCN / GATv2 flax modules over padded blocks
- ``train``    — train step, metrics, checkpointing, CLI harness
- ``parallel`` — mesh/sharding utilities, multi-chip train step
- ``utils``    — padding, PRNG, logging helpers
"""

__version__ = "0.1.0"

from bliss_gnn_tpu.graph.structure import Graph, DeviceGraph  # noqa: F401
