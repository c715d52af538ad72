"""AABB refit for updated vertex positions (SURVEY.md §2b #8).

During inverse rendering the mesh topology and Morton order are kept fixed
between (occasional) rebuilds while vertices move every step; `refit_aabbs`
recomputes all node AABBs bottom-up without re-sorting — level-synchronous
dense passes (the TPU analogue of the GPU atomic-flag walk).  Jittable, so it
lives inside the fit step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpurt.accel.lbvh import BVH, refit_node_aabbs
from tpurt.core.geometry import Triangles

Array = jax.Array


def range_minmax_sparse(leaf_lo: Array, leaf_hi: Array,
                        first: Array, last: Array):
    """Box of every [first, last] leaf range via a sparse-table RMQ.

    Karras internal nodes cover CONTIGUOUS sorted-leaf ranges, so a node box
    is a range-min/max over the sorted per-leaf boxes — no tree walk needed.
    Sparse table: level k holds the reduce over windows [i, i + 2^k); any
    range is covered exactly by two overlapping power-of-2 windows (min/max
    are idempotent, so the overlap is harmless and the result is BITWISE
    identical to the bottom-up child-fold).  Build is log2(N) dense passes
    (~3 ms at 1M); queries are two row gathers per id array.

    Measured motivation (v5e, docs/PERF.md round 4): the level-synchronous
    refit walk cost 702 ms at 1M tris (128 full-array gather passes) and was
    2/3 of the whole fwd+bwd fit step; this form is ~21x faster.
    """
    n = leaf_lo.shape[0]
    big = jnp.float32(3.0e38)
    box = jnp.concatenate([leaf_lo, -leaf_hi], axis=-1)  # min-reduce both
    levels = [box]
    k = 1
    while (1 << k) <= n:
        h = 1 << (k - 1)
        prev = levels[-1]
        shifted = jnp.concatenate(
            [prev[h:], jnp.full((h, 6), big, prev.dtype)]
        )
        levels.append(jnp.minimum(prev, shifted))
        k += 1
    table = jnp.stack(levels)                      # (K, n, 6)
    flat = table.reshape(-1, 6)
    length = last - first + 1
    kq = 31 - jax.lax.clz(length)                  # floor(log2(len)), exact
    a = flat[kq * n + first]
    b = flat[kq * n + (last + 1 - (1 << kq))]
    m = jnp.minimum(a, b)
    return m[..., 0:3], -m[..., 3:6]


def refit_aabbs(bvh: BVH, tris: Triangles, max_depth: int = 128,
                update_flat: bool = True) -> BVH:
    """Recompute node_lo/node_hi and the flat traversal AABBs for moved
    vertices, preserving tree topology, treelet cut and DFS threading.

    update_flat=False skips the flat_lo/flat_hi rewrite — those arrays feed
    only the binary engines (bvh/wave/packet/pallas); the BVH8 fit path
    reads node_lo/hi through refit_wide and the two (M, 3) scatter-sets are
    its single largest step cost otherwise (~340 ms of a 1M-tri step on
    v5e, docs/PERF.md round 4).  The returned BVH then carries STALE flat
    arrays — callers own that invariant."""
    v0, v1, v2 = tris.corners()
    tri_lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    tri_hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    if bvh.band > 0.0:
        pad = bvh.band * (jnp.abs(v1 - v0) + jnp.abs(v2 - v0)) + 1e-7
        tri_lo = tri_lo - pad
        tri_hi = tri_hi + pad

    if bvh.num_tris == 1:
        return bvh.replace(
            node_lo=tri_lo, node_hi=tri_hi, flat_lo=tri_lo, flat_hi=tri_hi
        )

    leaf_lo = tri_lo[bvh.tri_order]
    leaf_hi = tri_hi[bvh.tri_order]
    node_lo, node_hi = range_minmax_sparse(
        leaf_lo, leaf_hi, bvh.first, bvh.last
    )
    if not update_flat:
        return bvh.replace(node_lo=node_lo, node_hi=node_hi)
    m = bvh.num_flat
    flat_lo = jnp.zeros((m, 3), jnp.float32).at[bvh.dfs].set(
        node_lo, mode="drop"
    )
    flat_hi = jnp.zeros((m, 3), jnp.float32).at[bvh.dfs].set(
        node_hi, mode="drop"
    )
    return bvh.replace(
        node_lo=node_lo, node_hi=node_hi, flat_lo=flat_lo, flat_hi=flat_hi
    )
