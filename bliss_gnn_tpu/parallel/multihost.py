"""Multi-host initialization and collective-friendly helpers.

Single-controller JAX covers one host's chips; multi-host pods use
``jax.distributed`` with one process per host (SURVEY.md §5.8).  This
module wraps the standard recipe:

- ``initialize()`` — jax.distributed.initialize from env/TPU metadata;
- ``global_mesh()`` — a mesh spanning every process's devices;
- process-local seed-batch slicing for the DP step (each host feeds its
  slice of the global batch; shardings handle the rest).

On a single host these degrade to no-ops, so the Trainer can call them
unconditionally.  Tested logic-level on the CPU mesh; real multi-host
execution requires a pod slice (not available in this environment).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """jax.distributed.initialize when running multi-process; no-op (False)
    for single-process runs.  Args default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or TPU
    pod metadata when present."""
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )
    return True


def global_mesh(axis_names: Sequence[str] = ("dp",)) -> Mesh:
    """Mesh over ALL devices across processes (jax.devices() is global
    after jax.distributed.initialize)."""
    return Mesh(np.array(jax.devices()), axis_names=tuple(axis_names))


def local_batch_slice(global_batch: int) -> slice:
    """This process's contiguous slice of a global seed batch."""
    n = jax.process_count()
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def global_seed_batch(mesh: Mesh, arr: np.ndarray, axis: str = "dp",
                      batch_dim: int = -1):
    """Device-put a host-replicated global seed batch (or mask) as a global
    array sharded over ``axis`` along ``batch_dim``.

    Single-process: a plain transfer (jit reshards by its in_specs).
    Multi-process: every process computes the SAME global batch (identical
    host RNG seed), slices out its own contiguous chunk, and the chunks are
    assembled into one global jax.Array — the standard
    host_local_array_to_global_array recipe for feeding a pjit'd step from
    per-host data loaders."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    if jax.process_count() == 1:
        return jnp.asarray(arr)
    from jax.experimental import multihost_utils

    batch_dim = batch_dim % arr.ndim
    sl = [slice(None)] * arr.ndim
    sl[batch_dim] = local_batch_slice(arr.shape[batch_dim])
    spec = P(*[axis if d == batch_dim else None for d in range(arr.ndim)])
    return multihost_utils.host_local_array_to_global_array(
        arr[tuple(sl)], mesh, spec
    )


def global_array(mesh: Mesh, arr, spec, axis: str = "dp"):
    """Device-put one host-replicated array as a global jax.Array with
    ``spec`` over the multi-process ``mesh``.

    Every process holds the FULL host value (deterministic same-seed
    construction — the convention of this test/bench harness); for a
    dim sharded over ``axis`` each process contributes its contiguous
    slice, mirroring ``global_seed_batch``.  Single-process: a plain
    sharded device_put.  This is how the stacked ShardedDeviceGraph
    leaves ([n_dev, ...], P(axis) on the leading dim) and the sharded
    EXP3 state cross a real process boundary."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr), NamedSharding(mesh, spec))
    from jax.experimental import multihost_utils

    arr = np.asarray(arr)
    dims = list(spec) + [None] * (arr.ndim - len(spec))
    sl = [slice(None)] * arr.ndim
    for d, s in enumerate(dims):
        if s == axis:
            n = jax.process_count()
            per = arr.shape[d] // n
            i = jax.process_index()
            sl[d] = slice(i * per, (i + 1) * per)
    return multihost_utils.host_local_array_to_global_array(
        arr[tuple(sl)], mesh, spec
    )


def global_tree(mesh: Mesh, tree, spec_tree, axis: str = "dp"):
    """``global_array`` over a pytree with a (possibly prefix) spec
    pytree — a spec leaf covering a subtree (e.g. the single P() for the
    whole params dict in shardedstep._state_spec) broadcasts over its
    leaves, matching shard_map's in_specs semantics.  PartitionSpec
    leaves are guarded with is_leaf so an empty P() does not dissolve
    into its tuple elements."""
    from jax.sharding import PartitionSpec

    is_spec = lambda x: isinstance(x, PartitionSpec)  # noqa: E731
    specs_full = jax.tree_util.tree_broadcast(
        spec_tree, tree, is_leaf=is_spec
    )
    leaves, treedef = jax.tree.flatten(tree)
    specs, _ = jax.tree.flatten(specs_full, is_leaf=is_spec)
    assert len(leaves) == len(specs), (len(leaves), len(specs))
    out = [global_array(mesh, a, s, axis) for a, s in zip(leaves, specs)]
    return jax.tree.unflatten(treedef, out)
