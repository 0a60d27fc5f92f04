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
    n_devices: Optional[int] = None, axis_names: Sequence[str] = ("dp",)
) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all).

    Multi-axis meshes (dp x edge-shard) are constructed by reshaping the
    device list; for a 1-D seed-batch DP axis the device order is whatever
    jax.devices() yields, which respects ICI locality on TPU.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.array(devices)
    if len(axis_names) > 1:
        raise NotImplementedError("only 1-D meshes in round 1")
    return Mesh(arr, axis_names=tuple(axis_names))
