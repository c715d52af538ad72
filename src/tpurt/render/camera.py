"""Pinhole camera and primary-ray generation (SURVEY.md §2b #12).

Generates rays for all pixels at once in SoA layout — on TPU the whole
(H*W, 3) ray batch is a handful of fused VPU elementwise ops.  Supports
jittered anti-aliasing offsets via the counter-based RNG in core.math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpurt.core.geometry import Camera, Rays
from tpurt.core.math import cross, normalize

Array = jax.Array


def camera_basis(cam: Camera) -> tuple[Array, Array, Array]:
    """Right-handed view basis (right, up, forward)."""
    fwd = normalize(cam.target - cam.eye)
    right = normalize(cross(fwd, cam.up))
    up = cross(right, fwd)
    return right, up, fwd


def gen_primary_rays(
    cam: Camera,
    jitter: Array | None = None,
) -> Rays:
    """Primary rays for every pixel, row-major (H*W, 3).

    jitter: optional (H*W, 2) in [0,1) for AA sample offsets; defaults to
    pixel centers (0.5, 0.5). Directions are normalized.
    """
    h, w = cam.height, cam.width
    right, up, fwd = camera_basis(cam)
    tan_half = jnp.tan(jnp.deg2rad(cam.fov_y_deg) * 0.5)
    aspect = w / h

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    if jitter is None:
        jx = jy = 0.5
    else:
        jx, jy = jitter[..., 0], jitter[..., 1]
    # NDC in [-1, 1], y up, x right.
    px = ((xx + jx) / w * 2.0 - 1.0) * tan_half * aspect
    py = (1.0 - (yy + jy) / h * 2.0) * tan_half
    d = normalize(px[:, None] * right + py[:, None] * up + fwd)
    o = jnp.broadcast_to(cam.eye, d.shape)
    return Rays(o=o, d=d)


def gen_tile_rays(cam: Camera, y0: int, x0: int, th: int, tw: int) -> Rays:
    """Rays for one (th x tw) tile anchored at pixel (y0, x0)."""
    h, w = cam.height, cam.width
    right, up, fwd = camera_basis(cam)
    tan_half = jnp.tan(jnp.deg2rad(cam.fov_y_deg) * 0.5)
    aspect = w / h
    yy = y0 + jax.lax.broadcasted_iota(jnp.float32, (th, tw), 0)
    xx = x0 + jax.lax.broadcasted_iota(jnp.float32, (th, tw), 1)
    px = ((xx.reshape(-1) + 0.5) / w * 2.0 - 1.0) * tan_half * aspect
    py = (1.0 - (yy.reshape(-1) + 0.5) / h * 2.0) * tan_half
    d = normalize(px[:, None] * right + py[:, None] * up + fwd)
    return Rays(o=jnp.broadcast_to(cam.eye, d.shape), d=d)


def pixel_morton_perm(height: int, width: int):
    """Static Morton (Z-order) permutation of row-major pixel indices.

    Packet engines walk rays in flat order; scanline order gives a packet one
    thin 128x1 strip whose rays' traversal subtrees barely overlap, while
    Z-order gives it a compact ~16x16 screen tile (SURVEY.md §7 #10 "sort
    rays for coherence").  Pure numpy at trace time — the permutation depends
    only on the (static) resolution, so reordering costs one gather each way.

    Returns (perm, inv): rays_morton = rays_flat[perm]; x_flat = x_morton[inv].
    """
    import numpy as np

    yy, xx = np.mgrid[0:height, 0:width]

    def _spread(v):  # interleave-ready 16-bit spread (Morton magic constants)
        v = v.astype(np.uint32)
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    code = (_spread(xx) | (_spread(yy) << 1)).reshape(-1)
    perm = np.argsort(code, kind="stable")
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return perm, inv
