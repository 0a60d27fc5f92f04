"""Device mesh construction for multi-chip / multi-host training.

The reference has no distributed layer at all (SURVEY.md §2c); this is new
first-class design scope.  The mesh abstraction follows the standard JAX
recipe: one logical mesh with named axes, shardings annotated per array,
XLA inserting the collectives (ICI within a slice, DCN across slices).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("dp",),
    axis_sizes: Optional[Sequence[int]] = None,
) -> Mesh:
    """Mesh over the first n devices (default: all).

    1-D by default (seed-batch DP); multi-axis meshes (e.g. dp x es for
    data-parallel groups of edge shards) reshape the device list to
    ``axis_sizes``.  The device order is whatever jax.devices() yields,
    which respects ICI locality on TPU: the FASTEST-VARYING (last) axis
    gets the closest neighbors, so put the collective-heavy axis (the edge
    shard, whose boundary exchange is per-layer) last.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.array(devices)
    if len(axis_names) > 1:
        if axis_sizes is None or len(axis_sizes) != len(axis_names):
            raise ValueError(
                f"a {len(axis_names)}-axis mesh needs axis_sizes per axis"
            )
        if int(np.prod(axis_sizes)) != arr.size:
            raise ValueError(
                f"axis_sizes {tuple(axis_sizes)} != {arr.size} devices"
            )
        arr = arr.reshape(tuple(axis_sizes))
    return Mesh(arr, axis_names=tuple(axis_names))
