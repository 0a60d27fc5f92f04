"""HBM feature cache over host-resident features — the UVA/gpu_cache analog.

The reference trains ogbn-papers100M-scale graphs by leaving features in
host RAM and letting DGL's DataLoader serve them through UVA plus a GPU
feature cache with a ``__cache_miss__`` statistic
(train_lightning.py:376-380, :394, :451-461; model.py:252-263).  The TPU
equivalent here: node features stay in host memory (numpy, possibly
memory-mapped), the device holds a direct-mapped cache of hot rows, and a
per-batch gather runs as

    1. a jitted probe:  slot = gid % C, hit = (tags[slot] == gid)
    2. a host fetch of the missing rows (the only H2D transfer)
    3. a jitted insert+combine that refreshes the cache and assembles the
       [B, F] feature block

Misses are reported per batch; the Trainer logs them as ``cache_miss`` —
the same metric name the reference logs (train_lightning.py:454-461).

Direct-mapped (not LRU): the tag check and insert are pure vectorized ops
with no host-side bookkeeping, and under power-law access patterns hub
rows stabilize in the cache after the first epoch.  Duplicate slots within
one batch resolve arbitrarily-but-consistently via scatter (last write
wins) — correctness never depends on what the cache holds, only speed.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("capacity",))
def _probe(tags: jax.Array, gids: jax.Array, mask: jax.Array, capacity: int):
    slots = (gids % capacity).astype(jnp.int32)
    hit = mask & (jnp.take(tags, slots) == gids)
    miss = mask & jnp.logical_not(hit)
    return slots, hit, miss


@jax.jit
def _insert_and_gather(
    tags: jax.Array,
    data: jax.Array,
    slots: jax.Array,
    gids: jax.Array,
    hit: jax.Array,
    miss: jax.Array,
    fetched: jax.Array,  # [B, F] rows for missing slots (zeros elsewhere)
):
    # refresh the cache with the fetched rows.  Duplicate slots in one
    # batch must resolve to the SAME winner for tags and data (independent
    # scatters may pick different winners -> a tag pointing at another
    # gid's row), so pick one deterministic winner per slot first.
    b = gids.shape[0]
    arange = jnp.arange(b, dtype=jnp.int32)
    upd_slot = jnp.where(miss, slots, tags.shape[0])
    winner = (
        jnp.full(tags.shape[0], -1, jnp.int32)
        .at[upd_slot]
        .max(arange, mode="drop")
    )
    sel = miss & (jnp.take(winner, slots) == arange)
    upd_slot = jnp.where(sel, slots, tags.shape[0])
    # serve hits from the PRE-insert data: a colliding miss in this batch
    # may overwrite a hit row's slot
    cached = jnp.take(data, slots, axis=0)
    out = jnp.where(hit[:, None], cached, fetched)
    tags = tags.at[upd_slot].set(gids, mode="drop")
    data = data.at[upd_slot].set(fetched, mode="drop")
    return tags, data, out


@dataclasses.dataclass
class FeatureCache:
    """Direct-mapped device cache over host features.

    host: [N, F] numpy array (or memmap) — never uploaded wholesale.
    capacity: number of cached rows resident in HBM.
    """

    host: np.ndarray
    capacity: int
    dtype: jnp.dtype = jnp.bfloat16

    def __post_init__(self):
        self.capacity = int(min(self.capacity, len(self.host)))
        self.tags = jnp.full((self.capacity,), -1, jnp.int32)
        self.data = jnp.zeros(
            (self.capacity, self.host.shape[1]), self.dtype
        )
        self._hits = 0
        self._lookups = 0

    @property
    def miss_rate(self) -> float:
        """Cumulative miss fraction (the reference's __cache_miss__ is
        per-batch; Trainer logs the per-batch value and this runs as the
        session aggregate)."""
        if self._lookups == 0:
            return 0.0
        return 1.0 - self._hits / self._lookups

    def gather(
        self, gids: jax.Array, mask: jax.Array
    ) -> Tuple[jax.Array, float]:
        """Assemble [B, F] features for global node ids ``gids`` (masked
        slots return zeros).  Returns (features, batch_miss_rate)."""
        gids = jnp.where(mask, gids, -1)
        slots, hit, miss = _probe(self.tags, gids, mask, self.capacity)
        miss_np = np.asarray(miss)
        gids_np = np.asarray(gids)
        miss_idx = np.nonzero(miss_np)[0]
        fetched_np = np.zeros(
            (gids_np.shape[0], self.host.shape[1]), self.host.dtype
        )
        if len(miss_idx):
            fetched_np[miss_idx] = self.host[gids_np[miss_idx]]
        fetched = jnp.asarray(fetched_np, self.dtype)
        self.tags, self.data, out = _insert_and_gather(
            self.tags, self.data, slots, gids, hit, miss, fetched
        )
        n_valid = int(np.asarray(mask).sum())
        n_miss = int(len(miss_idx))
        self._lookups += n_valid
        self._hits += n_valid - n_miss
        rate = n_miss / max(n_valid, 1)
        return out, rate

    def warm(self, gids: np.ndarray):
        """Pre-populate the cache (e.g. with the highest-degree nodes)."""
        gids = np.asarray(gids, np.int64)[: self.capacity]
        j = jnp.asarray(gids.astype(np.int32))
        self.gather(j, jnp.ones(len(gids), bool))
