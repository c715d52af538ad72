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


def refit_aabbs(bvh: BVH, tris: Triangles, max_depth: int = 128) -> BVH:
    """Recompute node_lo/node_hi and the flat traversal AABBs for moved
    vertices, preserving tree topology, treelet cut and DFS threading."""
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
    node_lo, node_hi = refit_node_aabbs(
        bvh.left, bvh.right, leaf_lo, leaf_hi, max_depth
    )
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
