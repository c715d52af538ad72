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

from tpurt.accel.lbvh import BVH, range_minmax_sparse
from tpurt.core.geometry import Triangles

Array = jax.Array


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
