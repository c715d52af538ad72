"""Spatial scene partitioning — the TP/SP analogue (SURVEY.md §2b #20).

When the triangle soup is too large to replicate per chip (5M-tri config,
BASELINE.json:11), it is split into `n_parts` spatially coherent chunks:
triangles are ordered by the Morton code of their centroid (the same ordering
the LBVH uses) and cut into equal contiguous ranges, so each chunk is a
compact spatial cluster with a tight AABB.  Chunks are padded with sentinel
triangles (gid = -1, never reported as hits) to a common static size so the
stacked arrays shard cleanly with `P('rays')` on axis 0 under `shard_map`.

`route_rays` is the Ulysses-style all-to-all companion: for each ray it ranks
partitions by AABB entry distance, so a scheduler can send each ray to the
partition it is most likely to terminate in first (dist/ring.py consumes the
full rotation instead, which needs no routing).

The reference has no scene partitioning or tensor-parallel code to mirror
(SURVEY.md §0/§2a); the requirement is BASELINE.json:11's multi-host 5M-tri
row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from tpurt.accel.morton import triangle_morton_codes
from tpurt.core.geometry import T_MAX, AABB, Rays, Triangles

Array = jax.Array


class ScenePartition(struct.PyTreeNode):
    """A Morton-partitioned triangle soup in flat SoA layout.

    All arrays have leading dim `n_parts * chunk`; device d of an
    `n_parts`-device mesh owns rows [d*chunk, (d+1)*chunk) when sharded
    `P(axis)` on axis 0.
    """

    v0: Array  # (P*M, 3)
    v1: Array  # (P*M, 3)
    v2: Array  # (P*M, 3)
    albedo: Array  # (P*M, 3) per-face albedo, gathered into partition order
    gid: Array  # (P*M,) int32 original triangle index; -1 = padding
    lo: Array  # (P, 3) per-partition AABB lower corner
    hi: Array  # (P, 3) per-partition AABB upper corner
    n_parts: int = struct.field(pytree_node=False)

    @property
    def chunk(self) -> int:
        return self.gid.shape[0] // self.n_parts


def partition_scene(tris: Triangles, n_parts: int) -> ScenePartition:
    """Split `tris` into `n_parts` equal Morton-ordered chunks.

    Padding rows are degenerate triangles at the origin with gid = -1; the
    gid mask (not geometry) excludes them from hits, so padding can never
    produce false intersections or NaNs.
    """
    f = tris.num_tris
    codes = triangle_morton_codes(tris)
    order = jnp.argsort(codes)

    chunk = -(-f // n_parts)  # ceil
    total = n_parts * chunk
    pad = total - f
    gid = jnp.concatenate([order.astype(jnp.int32), jnp.full((pad,), -1, jnp.int32)])
    safe = jnp.maximum(gid, 0)

    v0, v1, v2 = tris.corners()
    v0p, v1p, v2p = v0[safe], v1[safe], v2[safe]
    alb = tris.albedo[safe]
    # Collapse padding rows to a point so their AABB contribution is benign.
    mask = (gid >= 0)[:, None]
    v0p = jnp.where(mask, v0p, 0.0)
    v1p = jnp.where(mask, v1p, 0.0)
    v2p = jnp.where(mask, v2p, 0.0)

    pts = jnp.stack([v0p, v1p, v2p], axis=1).reshape(n_parts, chunk * 3, 3)
    valid = jnp.repeat(mask.reshape(n_parts, chunk), 3, axis=1)[..., None]
    big = jnp.float32(T_MAX)
    lo = jnp.min(jnp.where(valid, pts, big), axis=1)
    hi = jnp.max(jnp.where(valid, pts, -big), axis=1)

    return ScenePartition(
        v0=v0p, v1=v1p, v2=v2p, albedo=alb, gid=gid, lo=lo, hi=hi, n_parts=n_parts
    )


def aabb_entry_t(o: Array, d: Array, lo: Array, hi: Array) -> Array:
    """Slab-test entry distance of rays (R,3) into boxes (P,3) -> (R,P).

    T_MAX where the ray misses the box entirely.
    """
    inv = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, jnp.float32(1e20) * jnp.sign(d) + 1e20)
    t0 = (lo[None] - o[:, None]) * inv[:, None]
    t1 = (hi[None] - o[:, None]) * inv[:, None]
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (far >= jnp.maximum(near, 0.0)) & (far > 0.0)
    return jnp.where(hit, jnp.maximum(near, 0.0), T_MAX)


def route_rays(rays: Rays, part: ScenePartition) -> Array:
    """Owner partition per ray: the partition whose AABB the ray enters first
    (Ulysses-style all-to-all routing key). Rays that miss every partition
    AABB get owner 0 — they miss everything anyway. Returns (R,) int32."""
    o = rays.o.reshape(-1, 3)
    d = rays.d.reshape(-1, 3)
    entry = aabb_entry_t(o, d, part.lo, part.hi)
    return jnp.argmin(entry, axis=1).astype(jnp.int32).reshape(rays.shape)
