"""Packet BVH traversal with a scalar node cursor (SURVEY.md §2b #10/#11).

Why packets: TPU has no per-lane divergence or cheap per-lane gather — XLA
lowers a vmapped `nodes[per_ray_cursor]` gather into a one-hot contraction of
shape (rays × nodes), which is O(R·M) memory (observed: a 128x128 render of a
20K-tri scene tried to materialize f32[16384,20000,3]).  The TPU-native
traversal instead walks the tree once per *packet* of PACKET_RAYS rays with a
single SCALAR cursor:

- node fetch       = `lax.dynamic_slice` of one (8,)/(4,) record — scalar
                     indexed, no gather;
- node test        = slab test of the whole packet, (PACKET_RAYS,) vector ops;
- descend decision = `any(ray wants node)` — packets visit the union of their
                     rays' subtrees (conservative; per-(ray,tri) accept tests
                     are self-contained, so results are bitwise identical to
                     per-ray traversal, same tie-break);
- leaf test        = the leaf's <= LEAF_CAP triangles are *pre-packed* into
                     one 128-float row (v0|e1|e2 per tri), fetched with one
                     dynamic slice and intersected against all packet rays as
                     dense (PACKET_RAYS,) Möller-Trumbore — the VPU-shaped
                     replacement for per-lane triangle gather.

Packets inherit coherence from scanline order (primary rays) — consecutive
pixels share most of their traversal path.  The same packed layout feeds the
Pallas kernels (kernels/traverse.py); this module is their semantics oracle
and the TPU-fast pure-JAX engine (`method='packet'`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from tpurt.accel.intersect import DEFAULT_T_MIN, DET_EPS
from tpurt.accel.lbvh import BVH
from tpurt.core.geometry import Hit, Rays, T_MAX, Triangles

Array = jax.Array

PACKET_RAYS = 1024  # (8, 128) VPU tile of rays walked together
LEAF_CAP = 8  # triangles packed per leaf row: LEAF_CAP * 9 floats <= 128


def max_cut_leaves(num_tris: int, leaf_size: int) -> int:
    """Static upper bound on treelet-cut leaves: a cut leaf's parent subtree
    has > leaf_size tris, so sibling leaf pairs cover >= leaf_size+1 tris ->
    at most 2*ceil(N/(leaf_size+1)) leaves.  Tight in practice (bunny 70K,
    leaf_size 8: bound 0.222N vs actual 0.197N); using it for pack shapes
    removes the device->host sync (`int(flat_is_leaf.sum())`) from the build
    path entirely."""
    return max(1, 2 * (-(-num_tris // (leaf_size + 1))))


class PackedBVH(struct.PyTreeNode):
    """Traversal-optimized flat BVH layout.

    node_f32: (M, 8)  [lo.x, lo.y, lo.z, hi.x, hi.y, hi.z, 0, 0]
    node_i32: (M, 4)  [escape (-1 terminates), leaf_row, pad, is_leaf]
    tri_rows: (L, 128) per-leaf packed triangles: LEAF_CAP x (v0, e1, e2),
              padded with degenerate (all-zero) triangles that fail every
              Möller-Trumbore det test.
    tri_ids:  (L, LEAF_CAP) original triangle id per packed slot, -1 pad.
    """

    node_f32: Array
    node_i32: Array
    tri_rows: Array
    tri_ids: Array
    band: float = struct.field(pytree_node=False, default=0.0)

    @property
    def num_nodes(self) -> int:
        return self.node_f32.shape[0]

    @property
    def num_leaves(self) -> int:
        return self.tri_rows.shape[0]


def pack_bvh(tris: Triangles, bvh: BVH, n_leaves: int | None = None) -> PackedBVH:
    """Re-layout a built LBVH (accel/lbvh.py) for packet traversal.

    Leaf rows are assigned in flat (DFS) node order so `leaf_row` is the
    rank of the leaf among flat leaves; triangle slots hold corner/edge
    vectors gathered via the Morton order (bvh.tri_order).

    The flat arrays in `bvh` have 2N-1 rows but only the LIVE prefix (nodes
    above/at the treelet cut) is meaningful; the cut tree is a full binary
    tree over its leaves, so the live count is exactly 2*n_leaves-1 and the
    packed node arrays are sliced to it — 5x smaller at leaf_size=8, which is
    the difference between fitting the Pallas kernels' VMEM budget or not.

    n_leaves (shape-determining) must be passed explicitly under jit:
    int(bvh.flat_is_leaf.sum()) computed outside.
    """
    if bvh.leaf_size > LEAF_CAP:
        raise ValueError(f"leaf_size {bvh.leaf_size} > packable {LEAF_CAP}")
    m = bvh.num_flat
    if n_leaves is None:
        n_leaves = int(jnp.sum(bvh.flat_is_leaf))
    n_live = 2 * n_leaves - 1
    flat_lo = bvh.flat_lo[:n_live]
    flat_hi = bvh.flat_hi[:n_live]
    is_leaf = bvh.flat_is_leaf[:n_live]
    node_f32 = jnp.concatenate(
        [flat_lo, flat_hi, jnp.zeros((n_live, 2), jnp.float32)], axis=1
    )
    leaf_row = jnp.cumsum(is_leaf.astype(jnp.int32)) - 1  # rank among leaves
    node_i32 = jnp.stack(
        [
            bvh.flat_escape[:n_live],
            jnp.where(is_leaf, leaf_row, 0),
            jnp.zeros((n_live,), jnp.int32),
            is_leaf.astype(jnp.int32),
        ],
        axis=1,
    )

    # Leaf-major triangle packing. Rows for non-leaf flat slots are dropped by
    # scattering through leaf_row (mode='drop' for non-leaves).
    slot = jnp.arange(LEAF_CAP)
    # sorted-space triangle index for each (live flat node, slot)
    si = bvh.flat_first[:n_live, None] + slot[None, :]
    in_range = slot[None, :] < bvh.flat_count[:n_live, None]
    si = jnp.clip(si, 0, bvh.num_tris - 1)
    tid = jnp.where(in_range, bvh.tri_order[si], -1)  # (n_live, LEAF_CAP)

    v0, v1, v2 = tris.corners()
    g = jnp.maximum(tid, 0)
    tv0 = jnp.where(in_range[..., None], v0[g], 0.0)
    te1 = jnp.where(in_range[..., None], v1[g] - v0[g], 0.0)
    te2 = jnp.where(in_range[..., None], v2[g] - v0[g], 0.0)
    rows = jnp.concatenate([tv0, te1, te2], axis=-1)  # (n_live, LEAF_CAP, 9)
    rows = rows.reshape(n_live, LEAF_CAP * 9)
    rows = jnp.pad(rows, ((0, 0), (0, 128 - LEAF_CAP * 9)))

    row_idx = jnp.where(is_leaf, leaf_row, n_live)  # non-leaves -> dropped
    tri_rows = jnp.zeros((n_leaves, 128), jnp.float32).at[row_idx].set(
        rows, mode="drop"
    )
    tri_ids = jnp.full((n_leaves, LEAF_CAP), -1, jnp.int32).at[row_idx].set(
        tid, mode="drop"
    )
    return PackedBVH(
        node_f32=node_f32,
        node_i32=node_i32,
        tri_rows=tri_rows,
        tri_ids=tri_ids,
        band=bvh.band,
    )


def refit_packed(packed: PackedBVH, bvh: BVH, tris: Triangles) -> PackedBVH:
    """Jittable layout update after vertices moved: new node AABBs come from
    an already-refit BVH (accel/refit.py); leaf triangle rows are regathered
    through the frozen tri_ids topology. Shapes are static."""
    n_live = packed.num_nodes
    node_f32 = jnp.concatenate(
        [bvh.flat_lo[:n_live], bvh.flat_hi[:n_live],
         jnp.zeros((n_live, 2), jnp.float32)], axis=1
    )
    in_range = packed.tri_ids >= 0
    g = jnp.maximum(packed.tri_ids, 0)
    v0, v1, v2 = tris.corners()
    tv0 = jnp.where(in_range[..., None], v0[g], 0.0)
    te1 = jnp.where(in_range[..., None], v1[g] - v0[g], 0.0)
    te2 = jnp.where(in_range[..., None], v2[g] - v0[g], 0.0)
    rows = jnp.concatenate([tv0, te1, te2], axis=-1).reshape(
        packed.num_leaves, LEAF_CAP * 9
    )
    rows = jnp.pad(rows, ((0, 0), (0, 128 - LEAF_CAP * 9)))
    return packed.replace(node_f32=node_f32, tri_rows=rows)


def _pad_packets(rays: Rays) -> tuple[Array, Array, int]:
    """Flatten rays and pad to PACKET_RAYS multiple (zero-direction pad rays
    hit nothing). Returns (o (P, K, 3), d (P, K, 3), original count)."""
    o = rays.o.reshape(-1, 3)
    d = rays.d.reshape(-1, 3)
    n = o.shape[0]
    pad = (-n) % PACKET_RAYS
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
    p = o.shape[0] // PACKET_RAYS
    return (
        o.reshape(p, PACKET_RAYS, 3),
        d.reshape(p, PACKET_RAYS, 3),
        n,
    )


def _safe_inv(d: Array) -> Array:
    return jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, jnp.sign(d) * 1e30 + 1e30)


def _node_records(packed: PackedBVH, node: Array):
    nf = jax.lax.dynamic_slice(packed.node_f32, (node, 0), (1, 8))[0]
    ni = jax.lax.dynamic_slice(packed.node_i32, (node, 0), (1, 4))[0]
    return nf, ni


def _slab(o: Array, inv_d: Array, nf: Array, t_min, t_upper):
    """Packet slab test. o/inv_d: (K, 3); nf: (8,) node record.
    Returns per-ray hit mask (K,)."""
    lo = nf[0:3]
    hi = nf[3:6]
    t0 = (lo[None, :] - o) * inv_d
    t1 = (hi[None, :] - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(tn, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(tf, axis=-1), t_upper)
    return t_near <= t_far


def _leaf_tris(packed: PackedBVH, leaf_row: Array):
    row = jax.lax.dynamic_slice(packed.tri_rows, (leaf_row, 0), (1, 128))[0]
    ids = jax.lax.dynamic_slice(
        packed.tri_ids, (leaf_row, 0), (1, LEAF_CAP)
    )[0]
    tris9 = row[: LEAF_CAP * 9].reshape(LEAF_CAP, 9)
    return tris9, ids


def _mt_packet(o, d, v0, e1, e2):
    """MT of the whole packet vs one triangle (broadcast scalars).
    o,d: (K,3); v0,e1,e2: (3,). Returns (t,u,v,det) each (K,)."""
    # Reductions written as sum(mul) to match accel/intersect.intersect_tri
    # bit-for-bit (matmul-style reduces can differ in the last ulp, which
    # flips boundary shadow tests vs the brute oracle).
    pvec = jnp.cross(d, e2[None, :])
    det = jnp.sum(e1[None, :] * pvec, axis=-1)
    inv_det = det / (det * det + DET_EPS)
    tvec = o - v0[None, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :])
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None, :] * qvec, axis=-1) * inv_det
    return t, u, v, det


# ---------------------------------------------------------------------------
# Closest hit
# ---------------------------------------------------------------------------
def traverse_packet(
    rays: Rays,
    tris: Triangles,
    packed: PackedBVH,
    t_min: float = DEFAULT_T_MIN,
) -> Hit:
    """Closest hit, packet engine. Bitwise-identical results to
    accel/traverse_ref.traverse_ref (same visit order and lower-id
    tie-break)."""
    o_p, d_p, n = _pad_packets(rays)

    def one_packet(o, d):
        inv_d = _safe_inv(d)

        def cond(s):
            return s[0] >= 0

        def body(s):
            node, t_b, u_b, v_b, id_b = s
            nf, ni = _node_records(packed, node)
            boxed = _slab(o, inv_d, nf, t_min, t_b)
            want = jnp.any(boxed)
            is_leaf = ni[3] > 0

            def do_leaf(acc):
                t_b, u_b, v_b, id_b = acc
                tris9, ids = _leaf_tris(packed, ni[1])
                for j in range(LEAF_CAP):  # static unroll
                    t, u, v, det = _mt_packet(
                        o, d, tris9[j, 0:3], tris9[j, 3:6], tris9[j, 6:9]
                    )
                    tid = ids[j]
                    better = (t < t_b) | ((t == t_b) & (tid < id_b) & (id_b >= 0))
                    ok = (
                        (jnp.abs(det) > DET_EPS)
                        & (u >= 0.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (t > t_min)
                        & better
                        & (tid >= 0)
                    )
                    t_b = jnp.where(ok, t, t_b)
                    u_b = jnp.where(ok, u, u_b)
                    v_b = jnp.where(ok, v, v_b)
                    id_b = jnp.where(ok, tid, id_b)
                return t_b, u_b, v_b, id_b

            t_b, u_b, v_b, id_b = jax.lax.cond(
                want & is_leaf, do_leaf, lambda a: a, (t_b, u_b, v_b, id_b)
            )
            nxt = jnp.where(want & (ni[3] == 0), node + 1, ni[0])
            return nxt, t_b, u_b, v_b, id_b

        # Loop-carry inits are derived from o so their varying-manual-axes
        # match the body outputs under shard_map (dist/ring.py runs this
        # engine per-shard; constants would be vma-unvarying and lax.cond /
        # while_loop reject the mismatch).
        zero = (jnp.min(o[:, 0]) * 0).astype(jnp.int32)
        init = (
            zero,
            jnp.full_like(o[:, 0], T_MAX),
            jnp.zeros_like(o[:, 0]),
            jnp.zeros_like(o[:, 0]),
            jnp.full_like(o[:, 0], -1, dtype=jnp.int32),
        )
        _, t, u, v, tid = jax.lax.while_loop(cond, body, init)
        return t, u, v, tid

    t, u, v, tid = jax.lax.map(lambda od: one_packet(*od), (o_p, d_p))
    shape = rays.shape
    return Hit(
        t=t.reshape(-1)[:n].reshape(shape),
        u=u.reshape(-1)[:n].reshape(shape),
        v=v.reshape(-1)[:n].reshape(shape),
        tri=tid.reshape(-1)[:n].reshape(shape),
    )


# ---------------------------------------------------------------------------
# Any hit (hard shadows)
# ---------------------------------------------------------------------------
def occluded_packet(
    rays: Rays,
    tris: Triangles,
    packed: PackedBVH,
    t_max,
    t_min: float = DEFAULT_T_MIN,
) -> Array:
    shape = rays.shape
    tmax_flat = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape).reshape(-1)
    n0 = tmax_flat.shape[0]
    pad = (-n0) % PACKET_RAYS
    if pad:
        tmax_flat = jnp.concatenate([tmax_flat, jnp.zeros((pad,), jnp.float32)])
    o_p, d_p, n = _pad_packets(rays)
    tm_p = tmax_flat.reshape(o_p.shape[0], PACKET_RAYS)

    def one_packet(o, d, tmax):
        inv_d = _safe_inv(d)

        def cond(s):
            node, blocked = s
            return (node >= 0) & ~jnp.all(blocked)

        def body(s):
            node, blocked = s
            nf, ni = _node_records(packed, node)
            boxed = _slab(o, inv_d, nf, t_min, tmax) & ~blocked
            want = jnp.any(boxed)
            is_leaf = ni[3] > 0

            def do_leaf(blocked):
                tris9, ids = _leaf_tris(packed, ni[1])
                for j in range(LEAF_CAP):
                    t, u, v, det = _mt_packet(
                        o, d, tris9[j, 0:3], tris9[j, 3:6], tris9[j, 6:9]
                    )
                    ok = (
                        (jnp.abs(det) > DET_EPS)
                        & (u >= 0.0)
                        & (v >= 0.0)
                        & (u + v <= 1.0)
                        & (t > t_min)
                        & (t < tmax)
                        & (ids[j] >= 0)
                    )
                    blocked = blocked | ok
                return blocked

            blocked = jax.lax.cond(
                want & is_leaf, do_leaf, lambda b: b, blocked
            )
            nxt = jnp.where(want & (ni[3] == 0), node + 1, ni[0])
            return nxt, blocked

        zero = (jnp.min(o[:, 0]) * 0).astype(jnp.int32)  # vma: see traverse
        _, blocked = jax.lax.while_loop(
            cond, body, (zero, jnp.zeros_like(o[:, 0], dtype=bool))
        )
        return blocked

    blocked = jax.lax.map(lambda x: one_packet(*x), (o_p, d_p, tm_p))
    return blocked.reshape(-1)[:n].reshape(shape)


# ---------------------------------------------------------------------------
# K nearest extended hits / occluder ids (soft differentiable path)
# ---------------------------------------------------------------------------
def k_nearest_ids_packet(
    rays: Rays,
    tris: Triangles,
    packed: PackedBVH,
    k: int,
    band: float,
    t_min: float = DEFAULT_T_MIN,
    t_max=T_MAX,
) -> Array:
    """Nearest-k extended-hit triangle ids per ray (discrete only; attrs are
    recomputed differentiably by the caller). t_max scalar or per-ray."""
    shape = rays.shape
    tmax_flat = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape).reshape(-1)
    pad = (-tmax_flat.shape[0]) % PACKET_RAYS
    if pad:
        tmax_flat = jnp.concatenate([tmax_flat, jnp.zeros((pad,), jnp.float32)])
    o_p, d_p, n = _pad_packets(rays)
    tm_p = tmax_flat.reshape(o_p.shape[0], PACKET_RAYS)

    def one_packet(o, d, tmax):
        inv_d = _safe_inv(d)
        kr = o.shape[0]
        ks = jnp.arange(k)

        def insert(ts, ids, t, tid, ok):
            # per-ray sorted insertion into the k-lists ((K, k) arrays),
            # lexicographic on (t, tri id) so equal-t ties order identically
            # to brute-force stable top_k in every engine
            last_wins = (t < ts[:, k - 1]) | (
                (t == ts[:, k - 1]) & (tid < ids[:, k - 1])
            )
            ok = ok & last_wins
            pos = jnp.sum(
                (ts < t[:, None]) | ((ts == t[:, None]) & (ids < tid)), axis=-1
            )  # (K,)
            at = ks[None, :] == pos[:, None]
            shift = (ks[None, :] > pos[:, None]) & ok[:, None]
            prev_ts = ts[:, jnp.maximum(ks - 1, 0)]
            prev_ids = ids[:, jnp.maximum(ks - 1, 0)]
            new_ts = jnp.where(
                ok[:, None] & at, t[:, None], jnp.where(shift, prev_ts, ts)
            )
            new_ids = jnp.where(
                ok[:, None] & at, tid, jnp.where(shift, prev_ids, ids)
            )
            return new_ts, new_ids

        def cond(s):
            return s[0] >= 0

        def body(s):
            node, ts, ids = s
            nf, ni = _node_records(packed, node)
            boxed = _slab(o, inv_d, nf, t_min, jnp.minimum(ts[:, k - 1], tmax))
            want = jnp.any(boxed)
            is_leaf = ni[3] > 0

            def do_leaf(acc):
                ts, ids = acc
                tris9, tids = _leaf_tris(packed, ni[1])
                for j in range(LEAF_CAP):
                    t, u, v, det = _mt_packet(
                        o, d, tris9[j, 0:3], tris9[j, 3:6], tris9[j, 6:9]
                    )
                    ok = (
                        (jnp.abs(det) > DET_EPS)
                        & (u >= -band)
                        & (v >= -band)
                        & (u + v <= 1.0 + band)
                        & (t > t_min)
                        & (t < tmax)
                        & (tids[j] >= 0)
                    )
                    ts, ids = insert(ts, ids, t, tids[j], ok)
                return ts, ids

            ts, ids = jax.lax.cond(
                want & is_leaf, do_leaf, lambda a: a, (ts, ids)
            )
            nxt = jnp.where(want & (ni[3] == 0), node + 1, ni[0])
            return nxt, ts, ids

        zero = (jnp.min(o[:, 0]) * 0).astype(jnp.int32)  # vma: see traverse
        base = jnp.zeros_like(o[:, 0])[:, None] + jnp.zeros((1, k), jnp.float32)
        init = (
            zero,
            base + T_MAX,
            base.astype(jnp.int32) - 1,
        )
        _, _, ids = jax.lax.while_loop(cond, body, init)
        return ids

    ids = jax.lax.map(lambda x: one_packet(*x), (o_p, d_p, tm_p))
    return ids.reshape(-1, k)[:n]
