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


# ---------------------------------------------------------------------------
# Area lights: emissive triangles sampled by area (SURVEY.md §2b #13; the
# `emission` field was carried but never sampled in round 1, VERDICT #10).
# ---------------------------------------------------------------------------
def sample_emitters(key: Array, tris, num: int):
    """Sample `num` points on the scene's emissive triangles.

    Faces are chosen proportional to area x mean emission and points
    uniformly by barycentric warp, so the returned pdf is w.r.t. AREA:
    pdf_k = weight_k / (A_k * sum(weights)).  Returns
    (points (S,3), normals (S,3), Le (S,3), pdf (S,), any_emitter: bool
    scalar array).  All shapes static; scenes without emitters return
    pdf = 0 (callers scale contributions by pdf-safe weights).
    """
    v0, v1, v2 = tris.corners()
    n_raw = jnp.cross(v1 - v0, v2 - v0)
    area = 0.5 * jnp.sqrt(jnp.maximum(dot(n_raw, n_raw), 1e-30))
    lum = jnp.mean(tris.emission, axis=-1)
    w = area * lum  # (F,)
    total_w = jnp.sum(w)
    any_emitter = total_w > 0.0
    probs = jnp.where(any_emitter, w / jnp.maximum(total_w, 1e-30), 0.0)

    kf, kb = jax.random.split(key)
    # Discrete face choice is structure, not a differentiable quantity.
    face = jax.lax.stop_gradient(
        jax.random.categorical(kf, jnp.log(jnp.maximum(probs, 1e-30)), shape=(num,))
    )
    r = jax.random.uniform(kb, (num, 2))
    su = jnp.sqrt(r[:, 0:1])
    b0 = 1.0 - su
    b1 = r[:, 1:2] * su
    b2 = 1.0 - b0 - b1
    p = b0 * v0[face] + b1 * v1[face] + b2 * v2[face]
    nl = n_raw[face]
    nl = nl / jnp.sqrt(jnp.maximum(dot(nl, nl, keepdims=True), 1e-30))
    le = tris.emission[face]
    pdf = probs[face] / jnp.maximum(area[face], 1e-30)  # area-measure pdf
    return p, nl, le, pdf, any_emitter


def area_light_contrib(
    p: Array,
    n: Array,
    albedo: Array,
    lp: Array,
    ln_: Array,
    le: Array,
    pdf: Array,
    visibility: Array,
) -> Array:
    """Monte-Carlo direct lighting from sampled emitter points.

    p, n, albedo: (R, 3); lp/ln_/le: (S, 3); pdf: (S,); visibility: (R, S).
    Returns (R, 3): mean over samples of
    albedo/pi * Le * cos_s * cos_l / r^2 / pdf * vis.
    """
    delta = lp[None, :, :] - p[:, None, :]  # (R, S, 3)
    r2 = jnp.maximum(dot(delta, delta), 1e-8)
    wi = delta / jnp.sqrt(r2)[..., None]
    cos_s = jnp.maximum(dot(wi, n[:, None, :]), 0.0)  # (R, S)
    cos_l = jnp.abs(dot(wi, ln_[None, :, :]))  # double-sided emitter
    g = cos_s * cos_l / r2 * visibility / jnp.maximum(pdf[None, :], 1e-30)
    g = jnp.where(pdf[None, :] > 0, g, 0.0)
    mc = jnp.mean(g[..., None] * le[None, :, :], axis=1)  # (R, 3)
    return albedo * INV_PI * mc
