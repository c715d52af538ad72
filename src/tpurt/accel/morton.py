"""30-bit 3D Morton codes for triangle centroids (SURVEY.md §2b #4).

Classic bit-interleave via magic-number expansion — pure elementwise integer
ops, fully vectorized on the VPU.  Centroids are normalized into the scene
AABB and quantized to 10 bits per axis; ties between equal codes are broken
by primitive index inside the LBVH delta function (accel/lbvh.py), per
Karras 2012 §4.  No reference implementation exists (SURVEY.md §0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpurt.core.geometry import AABB, Triangles

Array = jax.Array

MORTON_BITS = 10  # per axis -> 30-bit codes in uint32


def expand_bits(x: Array) -> Array:
    """Insert two zero bits after each of the low 10 bits of x (uint32)."""
    x = x.astype(jnp.uint32)
    x = (x * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    x = (x * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    x = (x * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    x = (x * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return x


def expand_bits_naive(x: Array) -> Array:
    """Loop-based reference for expand_bits (test oracle only)."""
    x = x.astype(jnp.uint32)
    out = jnp.zeros_like(x)
    for i in range(MORTON_BITS):
        bit = (x >> jnp.uint32(i)) & jnp.uint32(1)
        out = out | (bit << jnp.uint32(3 * i))
    return out


def quantize(p: Array, lo: Array, hi: Array) -> Array:
    """Normalize points into [0, 2^10) integer grid coordinates."""
    scale = 1.0 / jnp.maximum(hi - lo, 1e-12)
    x = jnp.clip((p - lo) * scale, 0.0, 1.0 - 1e-7)
    return (x * (1 << MORTON_BITS)).astype(jnp.uint32)


def morton3d(points: Array, bounds: AABB) -> Array:
    """30-bit Morton code of each point (..., 3) within bounds -> uint32."""
    q = quantize(points, bounds.lo, bounds.hi)
    return (
        (expand_bits(q[..., 0]) << jnp.uint32(2))
        | (expand_bits(q[..., 1]) << jnp.uint32(1))
        | expand_bits(q[..., 2])
    )


def triangle_morton_codes(tris: Triangles) -> Array:
    """Morton codes of triangle centroids over the scene bounds."""
    c = tris.centroids()
    bounds = AABB(lo=jnp.min(c, axis=0), hi=jnp.max(c, axis=0))
    return morton3d(c, bounds)
