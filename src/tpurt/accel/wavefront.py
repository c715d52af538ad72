"""Wavefront BVH traversal: all rays advance in lockstep (SURVEY.md §2b #10).

The dense-gather XLA engine.  Why this shape:

- A vmapped per-ray `while_loop` (accel/traverse_ref.py) makes XLA lower the
  per-ray `nodes[cursor]` fetch inside the loop as a one-hot contraction of
  shape (rays x nodes) — O(R*M) memory, observed OOM at 128x128 x 20K tris.
- Packet traversal (accel/packet.py) fixes the fetch with a scalar cursor but
  serializes packets through XLA's while-loop overhead (~us/iteration) and
  wastes VPU lanes on rays that don't want the current node.

Here the *whole ray batch* is one dense state: per-ray cursors (R,) and
per-ray best hit.  One iteration of a single global `lax.while_loop` advances
every ray one NODE: node records are fetched with ONE bulk gather (R indices
— an embedding-style lookup XLA compiles to a real gather), the slab test and
state transitions are (R,)-wide VPU ops, and when a ray sits on a wanted leaf
the leaf's triangles are all tested in that SAME iteration (a static unroll
of `leaf_size` masked gathers+MT tests).  Round 1 spent one iteration per
leaf TRIANGLE; whole-leaf steps cut the trip count from
max(node visits + 8 x leaf visits) to max(node visits) (VERDICT r1 next #1b).
Iteration count is the max over rays, not the sum — rays traverse different
subtrees concurrently, unlike packets.

Visit order per ray is identical to the per-ray reference (DFS + escape
links, ascending slot order within a leaf, lower-id tie-break), so hits match
accel/traverse_ref bitwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpurt.accel.intersect import DEFAULT_T_MIN, DET_EPS
from tpurt.accel.lbvh import BVH
from tpurt.core.geometry import Hit, Rays, T_MAX, Triangles

Array = jax.Array


def _safe_inv(d: Array) -> Array:
    return jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, jnp.sign(d) * 1e30 + 1e30)


def _gather_node(bvh: BVH, node: Array):
    """Bulk-gather per-ray node records (clipped; callers mask)."""
    i = jnp.maximum(node, 0)
    return (
        bvh.flat_lo[i],
        bvh.flat_hi[i],
        bvh.flat_escape[i],
        bvh.flat_is_leaf[i],
        bvh.flat_first[i],
        bvh.flat_count[i],
    )


def _slab_batch(o, inv_d, lo, hi, t_min, t_upper):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(tf, axis=-1), t_upper)
    return t_near <= t_far


def _mt_batch(o, d, v0, v1, v2):
    """MT for per-ray gathered triangles; same reductions as
    accel/traverse_ref._mt_scalar for bitwise-matching results."""
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = det / (det * det + DET_EPS)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    return t, u, v, det


def _gather_tri(tris: Triangles, bvh: BVH, si: Array):
    """Sorted-space triangle fetch: corners + original id."""
    si = jnp.clip(si, 0, bvh.num_tris - 1)
    tid = bvh.tri_order[si]
    f = tris.faces[tid]
    v0 = tris.verts[f[:, 0]]
    v1 = tris.verts[f[:, 1]]
    v2 = tris.verts[f[:, 2]]
    return v0, v1, v2, tid


def _advance(node, want, is_leaf, esc, active):
    """Shared cursor update: want&!leaf -> descend (node+1); else escape
    (a wanted leaf's triangles were already tested this iteration)."""
    nxt = jnp.where(want & ~is_leaf, node + 1, esc)
    return jnp.where(active, nxt, -1)


def wave_closest(
    rays: Rays, tris: Triangles, bvh: BVH, t_min: float = DEFAULT_T_MIN
) -> Hit:
    shape = rays.shape
    o = rays.o.reshape(-1, 3)
    d = rays.d.reshape(-1, 3)
    inv_d = _safe_inv(d)
    r = o.shape[0]

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        node, t_b, u_b, v_b, id_b = s
        lo, hi, esc, is_leaf, first, cnt = _gather_node(bvh, node)
        active = node >= 0
        want = _slab_batch(o, inv_d, lo, hi, t_min, t_b) & active
        process = want & is_leaf

        for j in range(bvh.leaf_size):  # whole leaf in one iteration
            v0, v1, v2, tid = _gather_tri(tris, bvh, first + j)
            t, u, v, det = _mt_batch(o, d, v0, v1, v2)
            better = (t < t_b) | ((t == t_b) & (tid < id_b) & (id_b >= 0))
            ok = (
                process
                & (j < cnt)
                & (jnp.abs(det) > DET_EPS)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > t_min)
                & better
            )
            t_b = jnp.where(ok, t, t_b)
            u_b = jnp.where(ok, u, u_b)
            v_b = jnp.where(ok, v, v_b)
            id_b = jnp.where(ok, tid, id_b)

        return _advance(node, want, is_leaf, esc, active), t_b, u_b, v_b, id_b

    init = (
        jnp.zeros((r,), jnp.int32),
        jnp.full((r,), T_MAX, jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.full((r,), -1, jnp.int32),
    )
    _, t, u, v, tid = jax.lax.while_loop(cond, body, init)
    return Hit(
        t=t.reshape(shape),
        u=u.reshape(shape),
        v=v.reshape(shape),
        tri=tid.reshape(shape),
    )


def wave_occluded(
    rays: Rays,
    tris: Triangles,
    bvh: BVH,
    t_max,
    t_min: float = DEFAULT_T_MIN,
) -> Array:
    shape = rays.shape
    o = rays.o.reshape(-1, 3)
    d = rays.d.reshape(-1, 3)
    inv_d = _safe_inv(d)
    r = o.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape).reshape(-1)

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        node, blocked = s
        lo, hi, esc, is_leaf, first, cnt = _gather_node(bvh, node)
        active = node >= 0
        want = _slab_batch(o, inv_d, lo, hi, t_min, tmax) & active
        process = want & is_leaf

        for j in range(bvh.leaf_size):
            v0, v1, v2, tid = _gather_tri(tris, bvh, first + j)
            t, u, v, det = _mt_batch(o, d, v0, v1, v2)
            hit = (
                process
                & (j < cnt)
                & (jnp.abs(det) > DET_EPS)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > t_min)
                & (t < tmax)
            )
            blocked = blocked | hit

        node = _advance(node, want, is_leaf, esc, active & ~blocked)
        return node, blocked

    init = (jnp.zeros((r,), jnp.int32), jnp.zeros((r,), bool))
    _, blocked = jax.lax.while_loop(cond, body, init)
    return blocked.reshape(shape)


def wave_k_ids(
    rays: Rays,
    tris: Triangles,
    bvh: BVH,
    k: int,
    band: float,
    t_min: float = DEFAULT_T_MIN,
    t_max=T_MAX,
) -> Array:
    """Nearest-k extended-hit ids per ray, lexicographic (t, id) order —
    the discrete half of the soft/differentiable path. Returns (R, k)."""
    shape = rays.shape
    o = rays.o.reshape(-1, 3)
    d = rays.d.reshape(-1, 3)
    inv_d = _safe_inv(d)
    r = o.shape[0]
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape).reshape(-1)
    ks = jnp.arange(k)

    def cond(s):
        return jnp.any(s[0] >= 0)

    def body(s):
        node, ts, ids = s
        lo, hi, esc, is_leaf, first, cnt = _gather_node(bvh, node)
        active = node >= 0
        t_upper = jnp.minimum(ts[:, k - 1], tmax)
        want = _slab_batch(o, inv_d, lo, hi, t_min, t_upper) & active
        process = want & is_leaf

        for j in range(bvh.leaf_size):
            v0, v1, v2, tid = _gather_tri(tris, bvh, first + j)
            t, u, v, det = _mt_batch(o, d, v0, v1, v2)
            ok = (
                process
                & (j < cnt)
                & (jnp.abs(det) > DET_EPS)
                & (u >= -band)
                & (v >= -band)
                & (u + v <= 1.0 + band)
                & (t > t_min)
                & (t < tmax)
            )
            # lexicographic (t, id) insertion, same as packet/ref engines
            ok = ok & (
                (t < ts[:, k - 1]) | ((t == ts[:, k - 1]) & (tid < ids[:, k - 1]))
            )
            pos = jnp.sum(
                (ts < t[:, None]) | ((ts == t[:, None]) & (ids < tid[:, None])),
                axis=-1,
            )
            at = ks[None, :] == pos[:, None]
            shift = (ks[None, :] > pos[:, None]) & ok[:, None]
            prev_ts = ts[:, jnp.maximum(ks - 1, 0)]
            prev_ids = ids[:, jnp.maximum(ks - 1, 0)]
            ts = jnp.where(
                ok[:, None] & at, t[:, None], jnp.where(shift, prev_ts, ts)
            )
            ids = jnp.where(
                ok[:, None] & at, tid[:, None], jnp.where(shift, prev_ids, ids)
            )

        return _advance(node, want, is_leaf, esc, active), ts, ids

    init = (
        jnp.zeros((r,), jnp.int32),
        jnp.full((r, k), T_MAX, jnp.float32),
        jnp.full((r, k), -1, jnp.int32),
    )
    _, _, ids = jax.lax.while_loop(cond, body, init)
    return ids
