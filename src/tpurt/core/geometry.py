"""Geometry core: Ray/Triangle/AABB/Hit/Camera as registered pytrees.

SURVEY.md §2b #1.  The reference snapshot contains no geometry code
(/root/reference — empty stub, SURVEY.md §0); this is the TPU-native design:
structure-of-arrays float32 leaves so every field maps onto (8,128) VPU lanes,
and all containers are `flax.struct` pytrees so they flow through jit / vmap /
shard_map / grad unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array

# Sentinel triangle id for "no hit".
MISS = np.int32(-1)  # plain numpy: importing tpurt must NOT init the backend
# (jax.distributed.initialize must run before first device use, dist/runtime.py)
# Large-but-finite ray parameter used as "infinity" (finite keeps grads clean).
T_MAX = 1e30


class Rays(struct.PyTreeNode):
    """A batch of rays in SoA layout.

    o: (..., 3) float origins.
    d: (..., 3) float directions (not necessarily normalized; intersection
       t-values are in units of |d|).
    """

    o: Array
    d: Array

    @property
    def shape(self) -> tuple[int, ...]:
        return self.o.shape[:-1]

    def at(self, t: Array) -> Array:
        """Point along each ray: o + t*d. t: (...,)."""
        return self.o + t[..., None] * self.d


class Triangles(struct.PyTreeNode):
    """Indexed triangle soup.

    verts: (V, 3) float vertex positions (the differentiable parameter).
    faces: (F, 3) int32 vertex indices.
    albedo: (F, 3) per-face Lambertian albedo (differentiable material).
    emission: (F, 3) per-face emission (area lights; zeros for non-emitters).
    """

    verts: Array
    faces: Array
    albedo: Array
    emission: Array

    @classmethod
    def create(
        cls,
        verts: Any,
        faces: Any,
        albedo: Any | None = None,
        emission: Any | None = None,
    ) -> "Triangles":
        verts = jnp.asarray(verts, jnp.float32)
        faces = jnp.asarray(faces, jnp.int32)
        n = faces.shape[0]
        if albedo is None:
            albedo = jnp.full((n, 3), 0.7, jnp.float32)
        else:
            albedo = jnp.broadcast_to(jnp.asarray(albedo, jnp.float32), (n, 3))
        if emission is None:
            emission = jnp.zeros((n, 3), jnp.float32)
        else:
            emission = jnp.broadcast_to(jnp.asarray(emission, jnp.float32), (n, 3))
        return cls(verts=verts, faces=faces, albedo=albedo, emission=emission)

    @property
    def num_tris(self) -> int:
        return self.faces.shape[0]

    @property
    def num_verts(self) -> int:
        return self.verts.shape[0]

    # Gathered corner positions. jax transposes these gathers into
    # segment-sum scatters during backprop, which is exactly the shared-vertex
    # gradient accumulation the backward pass needs (SURVEY.md §7 "#17").
    @property
    def v0(self) -> Array:
        return self.verts[self.faces[:, 0]]

    @property
    def v1(self) -> Array:
        return self.verts[self.faces[:, 1]]

    @property
    def v2(self) -> Array:
        return self.verts[self.faces[:, 2]]

    def corners(self) -> tuple[Array, Array, Array]:
        return self.v0, self.v1, self.v2

    def centroids(self) -> Array:
        return (self.v0 + self.v1 + self.v2) / 3.0

    def geometric_normals(self) -> Array:
        n = jnp.cross(self.v1 - self.v0, self.v2 - self.v0)
        return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)


class AABB(struct.PyTreeNode):
    """Axis-aligned bounding box(es): lo/hi (..., 3)."""

    lo: Array
    hi: Array

    @classmethod
    def of_points(cls, pts: Array, axis: int = 0) -> "AABB":
        return cls(lo=jnp.min(pts, axis=axis), hi=jnp.max(pts, axis=axis))

    @classmethod
    def of_triangles(cls, tris: Triangles) -> "AABB":
        """Per-triangle AABBs, shape (F, 3)."""
        v0, v1, v2 = tris.corners()
        lo = jnp.minimum(jnp.minimum(v0, v1), v2)
        hi = jnp.maximum(jnp.maximum(v0, v1), v2)
        return cls(lo=lo, hi=hi)

    def union(self, other: "AABB") -> "AABB":
        return AABB(lo=jnp.minimum(self.lo, other.lo), hi=jnp.maximum(self.hi, other.hi))

    def reduce(self) -> "AABB":
        """Union over the leading axis -> scalar box (3,)."""
        return AABB(lo=jnp.min(self.lo, axis=0), hi=jnp.max(self.hi, axis=0))

    def contains(self, other: "AABB", eps: float = 1e-5) -> Array:
        return jnp.all(self.lo - eps <= other.lo, axis=-1) & jnp.all(
            self.hi + eps >= other.hi, axis=-1
        )

    def centroid(self) -> Array:
        return 0.5 * (self.lo + self.hi)


class Hit(struct.PyTreeNode):
    """Per-ray intersection record.

    t: (...,) ray parameter of closest hit (T_MAX when miss).
    u, v: (...,) barycentrics of the hit point (w.r.t. v1, v2).
    tri: (...,) int32 triangle index, MISS (-1) when no hit.
    """

    t: Array
    u: Array
    v: Array
    tri: Array

    @classmethod
    def none(cls, shape: tuple[int, ...]) -> "Hit":
        f = jnp.full(shape, T_MAX, jnp.float32)
        z = jnp.zeros(shape, jnp.float32)
        return cls(t=f, u=z, v=z, tri=jnp.full(shape, MISS, jnp.int32))

    @property
    def valid(self) -> Array:
        return self.tri >= 0


class KHits(struct.PyTreeNode):
    """K nearest *extended* hits per ray, front-to-back (for soft edges).

    t/u/v: (..., K); tri: (..., K) int32 with MISS padding. Extended means the
    triangle was intersected with a barycentric tolerance band so near-miss
    rays still record the triangle (diff/softvis.py compositing).
    """

    t: Array
    u: Array
    v: Array
    tri: Array

    @property
    def valid(self) -> Array:
        return self.tri >= 0

    @property
    def k(self) -> int:
        return self.tri.shape[-1]


class Camera(struct.PyTreeNode):
    """Pinhole camera. width/height are static (shape-determining) fields."""

    eye: Array
    target: Array
    up: Array
    fov_y_deg: Array  # vertical field of view, degrees
    width: int = struct.field(pytree_node=False, default=256)
    height: int = struct.field(pytree_node=False, default=256)

    @classmethod
    def create(
        cls,
        eye,
        target,
        up=(0.0, 1.0, 0.0),
        fov_y_deg: float = 45.0,
        width: int = 256,
        height: int = 256,
    ) -> "Camera":
        return cls(
            eye=jnp.asarray(eye, jnp.float32),
            target=jnp.asarray(target, jnp.float32),
            up=jnp.asarray(up, jnp.float32),
            fov_y_deg=jnp.asarray(fov_y_deg, jnp.float32),
            width=width,
            height=height,
        )

    @property
    def num_pixels(self) -> int:
        return self.width * self.height


class PointLight(struct.PyTreeNode):
    """Point light(s): position (L,3), intensity (L,3) (radiant, 1/r^2 falloff)."""

    pos: Array
    intensity: Array

    @classmethod
    def create(cls, pos, intensity) -> "PointLight":
        pos = jnp.atleast_2d(jnp.asarray(pos, jnp.float32))
        intensity = jnp.broadcast_to(
            jnp.atleast_2d(jnp.asarray(intensity, jnp.float32)), pos.shape
        )
        return cls(pos=pos, intensity=intensity)
