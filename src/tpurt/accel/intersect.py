"""Möller–Trumbore ray-triangle intersection (SURVEY.md §2b #9).

Closed-form, branchless, fully differentiable in ray and vertices.  Also hosts
the O(rays·tris) brute-force intersector that serves as the whole-pipeline
oracle on small scenes (SURVEY.md §4b), and the matmul ("MXU") formulation of
the all-pairs test used by the TPU leaf-intersection kernels: every
Möller–Trumbore determinant is a scalar triple product, so the four quantities
(det, t·det, u·det, v·det) for all (ray, triangle) pairs factor into a single
(R×8)·(8×T) matrix product of per-ray and per-triangle feature vectors — the
TPU-native way to burn intersection FLOPs on the systolic array instead of
scalar lanes.  No reference implementation exists to mirror (SURVEY.md §0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpurt.core.geometry import Hit, Rays, T_MAX, Triangles
from tpurt.core.math import cross, dot

Array = jax.Array

# Rays starting exactly on a surface would self-intersect at t=0; offset.
DEFAULT_T_MIN = 1e-4
# Determinant cutoff for "parallel" rays.
DET_EPS = 1e-12


def intersect_tri(
    o: Array,
    d: Array,
    v0: Array,
    v1: Array,
    v2: Array,
    t_min: float = DEFAULT_T_MIN,
) -> tuple[Array, Array, Array, Array]:
    """Möller–Trumbore for broadcast-compatible batches.

    Returns (t, u, v, hit_mask); t == T_MAX where hit_mask is False.
    All outputs are smooth functions of the inputs wherever hit_mask is
    locally constant, so jax.grad applies directly.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    inv_det = det / (det * det + DET_EPS)  # smooth pseudo-inverse
    tvec = o - v0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
    )
    return jnp.where(hit, t, T_MAX), u, v, hit


def intersect_brute(
    rays: Rays, tris: Triangles, t_min: float = DEFAULT_T_MIN, t_max: float = T_MAX
) -> Hit:
    """Closest hit by testing every ray against every triangle.

    O(R·T) — the ground-truth oracle for small scenes (Cornell box,
    BASELINE.json:7). Rays may have any leading shape.
    """
    shape = rays.shape
    o = rays.o.reshape(-1, 1, 3)
    d = rays.d.reshape(-1, 1, 3)
    v0, v1, v2 = tris.corners()
    t, u, v, hit = intersect_tri(o, d, v0[None], v1[None], v2[None], t_min)
    t = jnp.where(hit & (t < t_max), t, T_MAX)
    best = jnp.argmin(t, axis=1)
    r = jnp.arange(t.shape[0])
    t_best = t[r, best]
    valid = t_best < T_MAX
    return Hit(
        t=t_best.reshape(shape),
        u=jnp.where(valid, u[r, best], 0.0).reshape(shape),
        v=jnp.where(valid, v[r, best], 0.0).reshape(shape),
        tri=jnp.where(valid, best, -1).astype(jnp.int32).reshape(shape),
    )


def occluded_brute(
    rays: Rays, tris: Triangles, t_min: float = DEFAULT_T_MIN, t_max: float = T_MAX
) -> Array:
    """Any-hit test in (t_min, t_max): True where the segment is blocked.

    t_max may be scalar or per-ray (broadcast against the ray batch).
    """
    o = rays.o.reshape(-1, 1, 3)
    d = rays.d.reshape(-1, 1, 3)
    tmax = jnp.asarray(t_max, jnp.float32)
    if tmax.ndim > 0:
        tmax = tmax.reshape(-1, 1)
    v0, v1, v2 = tris.corners()
    t, _, _, hit = intersect_tri(o, d, v0[None], v1[None], v2[None], t_min)
    blocked = jnp.any(hit & (t < tmax), axis=1)
    return blocked.reshape(rays.shape)


# ---------------------------------------------------------------------------
# All-pairs Möller–Trumbore as a matrix product (MXU formulation).
#
# Derivation: with e1=v1-v0, e2=v2-v0,
#   det   = det[d, e1, e2]              = d·(e1×e2)
#   u·det = det[o-v0, d, e2] · (-1)^?   — careful with sign conventions:
# using the standard MT quantities:
#   det    =  (d×e2)·e1        = d · (e2×e1) ... we use n = e1×e2:
#   det    = -d·n? — instead we derive from triple products directly:
#   det    = cross(d, e2)·e1   = det[d, e2, e1]... (see _tri_features)
# Each quantity is multilinear in {o, d, o×d} and per-triangle constants, so
#   [det, u·det, v·det, t·det] = RayFeat(o,d) @ TriFeat(v0,e1,e2)^T
# with RayFeat = [d, o×d, o, 1] ∈ R^10 and TriFeat columns in R^10.
# ---------------------------------------------------------------------------
def ray_features(o: Array, d: Array) -> Array:
    """(..., 10) features: [d, o×d, o, 1]."""
    one = jnp.ones((*o.shape[:-1], 1), o.dtype)
    return jnp.concatenate([d, cross(o, d), o, one], axis=-1)


def tri_features(v0: Array, v1: Array, v2: Array) -> Array:
    """(T, 10, 4) features s.t. ray_feat @ tri_feat = [det, u·det, v·det, t·det].

    Scalar triple product identities (a·(b×c) = det[a b c]):
      det      = d·(e1×e2)                       → d-block: e1×e2
      u·det    = (o-v0)·(d×e2)
               = det[o, d, e2] - det[v0, d, e2]
               = (o×d)·e2 - d·(e2×v0)            → (o×d)-block: e2, d-block: -(e2×v0)
      v·det    = d·((o-v0)×e1)
               = d·(o×e1) - d·(v0×e1)
               = -(o×d)·e1 + ... careful: d·(o×e1) = det[d, o, e1] = (d×o)·e1
               = -(o×d)·e1 ;  d·(v0×e1) = d·(v0×e1)
             so v·det = -(o×d)·e1 - d·(v0×e1)
      t·det    = e2·((o-v0)×e1) = e2·(o×e1) - e2·(v0×e1)
               = det[e2, o, e1] - e2·(v0×e1)
               = o·(e1×e2) - e2·(v0×e1)          → o-block: e1×e2, const: -e2·(v0×e1)
    """
    e1 = v1 - v0
    e2 = v2 - v0
    n = cross(e1, e2)
    z3 = jnp.zeros_like(e1)
    z1 = jnp.zeros(e1.shape[:-1] + (1,), e1.dtype)
    const_t = -dot(e2, cross(v0, e1))[..., None]

    def col(d_blk, oxd_blk, o_blk, c_blk):
        return jnp.concatenate([d_blk, oxd_blk, o_blk, c_blk], axis=-1)

    # det = det[e1,d,e2] = d·(e2×e1) = -d·n  (sign consistent with u/v/t cols)
    det_col = col(-n, z3, z3, z1)
    u_col = col(-cross(e2, v0), e2, z3, z1)
    v_col = col(-cross(v0, e1), -e1, z3, z1)
    t_col = col(z3, z3, n, const_t)
    return jnp.stack([det_col, u_col, v_col, t_col], axis=-1)


def intersect_pairs_mm(
    o: Array, d: Array, v0: Array, v1: Array, v2: Array,
    t_min: float = DEFAULT_T_MIN,
    precision=jax.lax.Precision.HIGHEST,
) -> tuple[Array, Array, Array, Array]:
    """All-pairs MT via one (R,10)x(T,10,4) contraction on the MXU.

    Returns (t, u, v, hit) each of shape (R, T).
    """
    rf = ray_features(o, d)  # (R, 10)
    tf = tri_features(v0, v1, v2)  # (T, 10, 4)
    q = jnp.einsum("rk,tkc->rtc", rf, tf, precision=precision)  # (R, T, 4)
    det, u_det, v_det, t_det = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    inv_det = det / (det * det + DET_EPS)
    u = u_det * inv_det
    v = v_det * inv_det
    t = t_det * inv_det
    hit = (
        (jnp.abs(det) > DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
    )
    return jnp.where(hit, t, T_MAX), u, v, hit
