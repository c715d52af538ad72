"""Lambertian shading with point-light shadow rays (SURVEY.md §2b #13).

Pure elementwise math over ray batches — XLA fuses the whole shader into the
surrounding pipeline.  The shading value is a smooth function of hit position,
normal, albedo and per-light visibility, so the same code serves both the
forward renderer and the differentiable path (visibility becomes a soft
[0,1] factor there, see diff/softvis.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpurt.core.geometry import PointLight
from tpurt.core.math import dot, normalize

Array = jax.Array

INV_PI = 0.3183098861837907


def light_dirs(p: Array, lights: PointLight) -> tuple[Array, Array, Array]:
    """Per-(ray, light) unit directions, distances, incident intensity.

    p: (R, 3) hit points. Returns (wi (R,L,3), dist (R,L), irradiance-scale
    I/r^2 (R,L,3)).
    """
    delta = lights.pos[None, :, :] - p[:, None, :]  # (R, L, 3)
    dist = jnp.sqrt(jnp.maximum(dot(delta, delta), 1e-12))
    wi = delta / dist[..., None]
    falloff = lights.intensity[None] / jnp.maximum(dist * dist, 1e-8)[..., None]
    return wi, dist, falloff


def shade_lambert(
    p: Array,
    n: Array,
    albedo: Array,
    emission: Array,
    lights: PointLight,
    visibility: Array,
    ambient: Array,
) -> Array:
    """Lambertian direct lighting.

    p, n, albedo, emission: (R, 3); visibility: (R, L) in [0,1] (soft or hard
    shadow-ray transmittance per light); ambient: (3,).
    Normals are treated as double-sided (|n·wi|-free: we flip n toward the
    light-independent viewer side upstream; here we use max(n·wi, 0) on the
    possibly-flipped normal).
    """
    wi, _, falloff = light_dirs(p, lights)
    ndotl = jnp.maximum(dot(wi, n[:, None, :]), 0.0)  # (R, L)
    direct = jnp.sum(
        falloff * (ndotl * visibility)[..., None], axis=1
    )  # (R, 3)
    return emission + albedo * (INV_PI * direct + ambient[None, :])


def face_forward(n: Array, d: Array) -> Array:
    """Flip normals to face the incoming ray (double-sided shading)."""
    return jnp.where(dot(n, d, keepdims=True) > 0.0, -n, n)
