"""Stackless threaded-BVH traversal — pure JAX reference (SURVEY.md §2b #11).

Per-ray `lax.while_loop` over the DFS-ordered flat BVH with escape links
(accel/lbvh.py): AABB hit -> descend to node+1, miss (or after a leaf) ->
jump to escape[node].  vmapped over the ray batch; XLA batches the loop with
all-lanes-active masking, which is exactly the "all rays step together"
semantics the Pallas packet kernel implements natively.  This module is the
semantics oracle for kernels/traverse.py on any scene size.

Variants: closest-hit, any-hit (shadow), K-nearest extended hits and soft
occlusion for the differentiable path (identical alpha model to
diff/softvis.py brute force).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpurt.accel.intersect import DEFAULT_T_MIN, DET_EPS
from tpurt.accel.lbvh import BVH
from tpurt.core.geometry import Hit, KHits, Rays, T_MAX, Triangles

Array = jax.Array


def _slab_hit(o, inv_d, lo, hi, t_min, t_max):
    """Ray-AABB slab test (scalar ray vs one box)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn), t_min)
    t_far = jnp.minimum(jnp.min(tf), t_max)
    return t_near <= t_far


def _safe_inv(d):
    # Signed infinite-ish inverse: keeps slab tests correct for axis-parallel
    # rays (IEEE inf semantics without 0*inf NaNs for on-plane origins).
    return jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, jnp.sign(d) * 1e30 + 1e30)


def _mt_scalar(o, d, v0, v1, v2):
    """Möller–Trumbore for one (ray, tri) pair; returns (t,u,v,det,cos_dn)."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(d, e2)
    det = jnp.dot(e1, pvec)
    inv_det = det / (det * det + DET_EPS)
    tvec = o - v0
    u = jnp.dot(tvec, pvec) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.dot(d, qvec) * inv_det
    t = jnp.dot(e2, qvec) * inv_det
    n = jnp.cross(e1, e2)
    cos_dn = det / jnp.sqrt(
        jnp.maximum(jnp.dot(d, d) * jnp.dot(n, n), 1e-30)
    )
    return t, u, v, det, cos_dn


def _sorted_tri_verts(tris: Triangles, bvh: BVH):
    """Triangle corner arrays permuted into Morton order (leaf ranges are
    contiguous in this layout)."""
    v0, v1, v2 = tris.corners()
    return v0[bvh.tri_order], v1[bvh.tri_order], v2[bvh.tri_order]


# ---------------------------------------------------------------------------
# Closest hit
# ---------------------------------------------------------------------------
def traverse_ref(
    rays: Rays, tris: Triangles, bvh: BVH, t_min: float = DEFAULT_T_MIN
) -> Hit:
    sv0, sv1, sv2 = _sorted_tri_verts(tris, bvh)
    leaf_cap = bvh.leaf_size

    def one_ray(o, d):
        inv_d = _safe_inv(d)

        def cond(state):
            node, *_ = state
            return node >= 0

        def body(state):
            node, t_best, u_best, v_best, tri_best = state
            lo = bvh.flat_lo[node]
            hi = bvh.flat_hi[node]
            boxed = _slab_hit(o, inv_d, lo, hi, t_min, t_best)
            is_leaf = bvh.flat_is_leaf[node]

            def do_leaf(args):
                t_best, u_best, v_best, tri_best = args
                start = bvh.flat_first[node]
                count = bvh.flat_count[node]

                def tri_body(k, acc):
                    t_b, u_b, v_b, id_b = acc
                    si = start + k
                    tid = bvh.tri_order[si]
                    t, u, v, det, _ = _mt_scalar(o, d, sv0[si], sv1[si], sv2[si])
                    # Tie-break equal-t hits (coplanar tris sharing an edge)
                    # toward the lower original id — matches intersect_brute's
                    # argmin so every engine is bitwise comparable.
                    better = (t < t_b) | ((t == t_b) & (tid < id_b) & (id_b >= 0))
                    ok = (
                        (jnp.abs(det) > DET_EPS)
                        & (u >= 0.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (t > t_min)
                        & better
                        & (k < count)
                    )
                    return (
                        jnp.where(ok, t, t_b),
                        jnp.where(ok, u, u_b),
                        jnp.where(ok, v, v_b),
                        jnp.where(ok, tid, id_b),
                    )

                return jax.lax.fori_loop(
                    0, leaf_cap, tri_body, (t_best, u_best, v_best, tri_best)
                )

            hit_leaf = boxed & is_leaf
            t_best, u_best, v_best, tri_best = jax.lax.cond(
                hit_leaf,
                do_leaf,
                lambda a: a,
                (t_best, u_best, v_best, tri_best),
            )
            descend = boxed & ~is_leaf
            nxt = jnp.where(descend, node + 1, bvh.flat_escape[node])
            return nxt, t_best, u_best, v_best, tri_best

        init = (
            jnp.int32(0),
            jnp.float32(T_MAX),
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.int32(-1),
        )
        _, t, u, v, tri = jax.lax.while_loop(cond, body, init)
        return t, u, v, tri

    shape = rays.shape
    t, u, v, tri = jax.vmap(one_ray)(
        rays.o.reshape(-1, 3), rays.d.reshape(-1, 3)
    )
    return Hit(
        t=t.reshape(shape),
        u=u.reshape(shape),
        v=v.reshape(shape),
        tri=tri.reshape(shape),
    )


# ---------------------------------------------------------------------------
# Any hit (hard shadows)
# ---------------------------------------------------------------------------
def occluded_ref(
    rays: Rays,
    tris: Triangles,
    bvh: BVH,
    t_max,
    t_min: float = DEFAULT_T_MIN,
) -> Array:
    sv0, sv1, sv2 = _sorted_tri_verts(tris, bvh)
    leaf_cap = bvh.leaf_size
    shape = rays.shape
    tmax_arr = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), shape
    ).reshape(-1)

    def one_ray(o, d, tmax):
        inv_d = _safe_inv(d)

        def cond(state):
            node, blocked = state
            return (node >= 0) & ~blocked

        def body(state):
            node, blocked = state
            boxed = _slab_hit(
                o, inv_d, bvh.flat_lo[node], bvh.flat_hi[node], t_min, tmax
            )
            is_leaf = bvh.flat_is_leaf[node]

            def do_leaf(b):
                start = bvh.flat_first[node]
                count = bvh.flat_count[node]

                def tri_body(k, acc):
                    si = start + k
                    t, u, v, det, _ = _mt_scalar(o, d, sv0[si], sv1[si], sv2[si])
                    ok = (
                        (jnp.abs(det) > DET_EPS)
                        & (u >= 0.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (t > t_min)
                        & (t < tmax)
                        & (k < count)
                    )
                    return acc | ok

                return jax.lax.fori_loop(0, leaf_cap, tri_body, b)

            blocked = jax.lax.cond(
                boxed & is_leaf, do_leaf, lambda b: b, blocked
            )
            descend = boxed & ~is_leaf
            nxt = jnp.where(descend, node + 1, bvh.flat_escape[node])
            return nxt, blocked

        _, blocked = jax.lax.while_loop(cond, body, (jnp.int32(0), False))
        return blocked

    blocked = jax.vmap(one_ray)(
        rays.o.reshape(-1, 3), rays.d.reshape(-1, 3), tmax_arr
    )
    return blocked.reshape(shape)


# ---------------------------------------------------------------------------
# K nearest extended hits (soft/differentiable path)
# ---------------------------------------------------------------------------
def k_nearest_ref(
    rays: Rays,
    tris: Triangles,
    bvh: BVH,
    k: int = 4,
    band: float = 0.08,
    t_min: float = DEFAULT_T_MIN,
    t_max: float = T_MAX,
) -> KHits:
    """K nearest extended hits via BVH traversal with insertion into a
    per-ray sorted K-list. Requires a BVH built with band-inflated AABBs
    (build_lbvh(..., band=band)) so near-miss hits are inside node boxes."""
    sv0, sv1, sv2 = _sorted_tri_verts(tris, bvh)
    leaf_cap = bvh.leaf_size

    def one_ray(o, d):
        inv_d = _safe_inv(d)
        ks = jnp.arange(k)

        def insert(lists, t, u, v, tri, ok):
            # lexicographic (t, id) order: equal-t ties match brute top_k
            ts, us, vs, ids = lists
            ok = ok & ((t < ts[k - 1]) | ((t == ts[k - 1]) & (tri < ids[k - 1])))
            pos = jnp.sum((ts < t) | ((ts == t) & (ids < tri)))
            shift = (ks > pos - 1) & ok  # entries at >= pos move right
            new_ts = jnp.where(
                ok & (ks == pos),
                t,
                jnp.where(shift & (ks > pos), ts[jnp.maximum(ks - 1, 0)], ts),
            )
            new_us = jnp.where(
                ok & (ks == pos),
                u,
                jnp.where(shift & (ks > pos), us[jnp.maximum(ks - 1, 0)], us),
            )
            new_vs = jnp.where(
                ok & (ks == pos),
                v,
                jnp.where(shift & (ks > pos), vs[jnp.maximum(ks - 1, 0)], vs),
            )
            new_ids = jnp.where(
                ok & (ks == pos),
                tri,
                jnp.where(shift & (ks > pos), ids[jnp.maximum(ks - 1, 0)], ids),
            )
            return new_ts, new_us, new_vs, new_ids

        def cond(state):
            node, *_ = state
            return node >= 0

        def body(state):
            node, lists = state
            ts = lists[0]
            boxed = _slab_hit(
                o, inv_d, bvh.flat_lo[node], bvh.flat_hi[node], t_min, ts[k - 1]
            )
            is_leaf = bvh.flat_is_leaf[node]

            def do_leaf(lists):
                start = bvh.flat_first[node]
                count = bvh.flat_count[node]

                def tri_body(kk, lists):
                    si = start + kk
                    t, u, v, det, _ = _mt_scalar(o, d, sv0[si], sv1[si], sv2[si])
                    ok = (
                        (jnp.abs(det) > DET_EPS)
                        & (u >= -band)
                        & (v >= -band)
                        & (u + v <= 1.0 + band)
                        & (t > t_min)
                        & (t < t_max)
                        & (kk < count)
                    )
                    return insert(lists, t, u, v, bvh.tri_order[si], ok)

                return jax.lax.fori_loop(0, leaf_cap, tri_body, lists)

            lists = jax.lax.cond(boxed & is_leaf, do_leaf, lambda x: x, lists)
            descend = boxed & ~is_leaf
            nxt = jnp.where(descend, node + 1, bvh.flat_escape[node])
            return nxt, lists

        init_lists = (
            jnp.full((k,), T_MAX, jnp.float32),
            jnp.zeros((k,), jnp.float32),
            jnp.zeros((k,), jnp.float32),
            jnp.full((k,), -1, jnp.int32),
        )
        _, lists = jax.lax.while_loop(cond, body, (jnp.int32(0), init_lists))
        return lists

    shape = rays.shape
    ts, us, vs, ids = jax.vmap(one_ray)(
        rays.o.reshape(-1, 3), rays.d.reshape(-1, 3)
    )
    return KHits(
        t=ts.reshape(*shape, k),
        u=us.reshape(*shape, k),
        v=vs.reshape(*shape, k),
        tri=ids.reshape(*shape, k),
    )


# ---------------------------------------------------------------------------
# Soft occlusion (differentiable shadows)
# ---------------------------------------------------------------------------
def occluder_ids_ref(
    rays: Rays,
    tris: Triangles,
    bvh: BVH,
    k: int,
    band: float,
    t_min: float,
    t_max: Array,
) -> Array:
    """Nearest-K extended-occluder ids per ray in (t_min, t_max) — discrete
    structure only, for the stop-gradient half of the differentiable shadow
    path.  t_max is per-ray (flat).  Returns (R, k) int32, -1 padded.
    """
    sv0, sv1, sv2 = _sorted_tri_verts(tris, bvh)
    leaf_cap = bvh.leaf_size

    def one_ray(o, d, tmax):
        inv_d = _safe_inv(d)
        ks = jnp.arange(k)

        def insert(lists, t, tri, ok):
            # lexicographic (t, id) order: equal-t ties match brute top_k
            ts, ids = lists
            ok = ok & ((t < ts[k - 1]) | ((t == ts[k - 1]) & (tri < ids[k - 1])))
            pos = jnp.sum((ts < t) | ((ts == t) & (ids < tri)))
            shift = (ks > pos - 1) & ok
            new_ts = jnp.where(
                ok & (ks == pos),
                t,
                jnp.where(shift & (ks > pos), ts[jnp.maximum(ks - 1, 0)], ts),
            )
            new_ids = jnp.where(
                ok & (ks == pos),
                tri,
                jnp.where(shift & (ks > pos), ids[jnp.maximum(ks - 1, 0)], ids),
            )
            return new_ts, new_ids

        def cond(state):
            node, *_ = state
            return node >= 0

        def body(state):
            node, lists = state
            boxed = _slab_hit(
                o, inv_d, bvh.flat_lo[node], bvh.flat_hi[node], t_min,
                jnp.minimum(lists[0][k - 1], tmax),
            )
            is_leaf = bvh.flat_is_leaf[node]

            def do_leaf(lists):
                start = bvh.flat_first[node]
                count = bvh.flat_count[node]

                def tri_body(kk, lists):
                    si = start + kk
                    t, u, v, det, _ = _mt_scalar(o, d, sv0[si], sv1[si], sv2[si])
                    ok = (
                        (jnp.abs(det) > DET_EPS)
                        & (u >= -band)
                        & (v >= -band)
                        & (u + v <= 1.0 + band)
                        & (t > t_min)
                        & (t < tmax)
                        & (kk < count)
                    )
                    return insert(lists, t, bvh.tri_order[si], ok)

                return jax.lax.fori_loop(0, leaf_cap, tri_body, lists)

            lists = jax.lax.cond(boxed & is_leaf, do_leaf, lambda x: x, lists)
            descend = boxed & ~is_leaf
            nxt = jnp.where(descend, node + 1, bvh.flat_escape[node])
            return nxt, lists

        init = (
            jnp.full((k,), T_MAX, jnp.float32),
            jnp.full((k,), -1, jnp.int32),
        )
        _, (_, ids) = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
        return ids

    return jax.vmap(one_ray)(
        rays.o.reshape(-1, 3), rays.d.reshape(-1, 3), t_max.reshape(-1)
    )


def soft_occlusion_ref(
    rays: Rays,
    tris: Triangles,
    bvh: BVH,
    sharpness: float,
    band: float = 0.08,
    t_min: float = DEFAULT_T_MIN,
    t_max=T_MAX,
    k_occ: int = 16,
) -> Array:
    """Transmittance: prod over extended occluders of (1 - alpha), same alpha
    model as diff/softvis.soft_occlusion_brute.

    Two-phase for reverse-mode autodiff (lax.while_loop has no transpose
    rule): (1) stop-gradient traversal collects the nearest k_occ extended
    occluder ids; (2) diff/softvis.soft_occlusion_from_ids recomputes the
    alpha product differentiably from gathered vertices.  Exact vs brute
    force whenever a shadow segment crosses <= k_occ extended occluders.
    """
    from tpurt.diff.softvis import soft_occlusion_from_ids

    shape = rays.shape
    flat = Rays(o=rays.o.reshape(-1, 3), d=rays.d.reshape(-1, 3))
    tmax_arr = jnp.broadcast_to(
        jnp.asarray(t_max, jnp.float32), shape
    ).reshape(-1)
    ids = jax.lax.stop_gradient(
        occluder_ids_ref(flat, tris, bvh, k_occ, band, t_min, 2.0 * tmax_arr)
    )
    return soft_occlusion_from_ids(
        flat, tris, ids, sharpness, band, t_min, tmax_arr
    ).reshape(shape)
