"""Fixed-capacity stream compaction — the TPU replacement for indirect dispatch.

Every GPU-side "append to a buffer + bump an indirect count" in the reference's culling
chain (SURVEY §2.8) becomes: mask → cumsum → unique-index permutation scatter into a
fixed-capacity buffer + a count. Overflow drops (callers size capacities from the
reference's published limits, BASELINE.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def masked_compact(mask: Array, capacity: int) -> tuple[Array, Array, Array]:
    """Compact indices of true entries of `mask` (N,) into a (capacity,) buffer.

    Returns (indices (capacity,) i32 — source index per slot, 0-filled past count;
             valid (capacity,) bool; count () i32 clamped to capacity)."""
    n = mask.shape[0]
    slots = jnp.cumsum(mask.astype(jnp.int32)) - 1
    target = jnp.where(mask & (slots < capacity), slots, n)
    src = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    out = jnp.zeros((capacity,), jnp.int32).at[target].set(src, mode="drop", unique_indices=True)
    count = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), capacity)
    valid = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0] < count
    return out, valid, count


def prefix_expand(counts: Array, capacity: int) -> tuple[Array, Array, Array]:
    """Expand variable-length groups into flat slots (gather-only, no scatter).

    counts (G,) → for each output slot s < capacity: (group (capacity,), rank-in-group
    (capacity,), valid). The reference's per-instance meshlet append
    (`cull_meshes.slang:64-75`) without atomics."""
    prefix = jnp.cumsum(counts)
    total = jnp.minimum(prefix[-1], capacity) if counts.shape[0] > 0 else jnp.int32(0)
    s = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    group = jnp.searchsorted(prefix, s, side="right").astype(jnp.int32)
    group_c = jnp.clip(group, 0, counts.shape[0] - 1)
    start = prefix[group_c] - counts[group_c]
    rank = s - start
    valid = s < total
    return group_c, rank, valid
