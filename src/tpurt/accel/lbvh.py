"""Karras (2012) binary-radix LBVH construction — pure JAX (SURVEY.md §2b #7).

TPU-native design notes:
- Every internal node's (direction, range, split) is independent, so the whole
  radix tree is built by fully-vectorized fixed-trip binary searches over the
  sorted Morton codes (31 masked steps instead of data-dependent loops —
  XLA-friendly, no dynamic shapes).  Uses the standard property that the
  longest-common-prefix `delta(i, k)` of *sorted distinct* keys is
  non-increasing in |k - i|, which makes the range/split predicates monotone
  and binary-searchable.  Duplicate Morton codes are disambiguated with index
  bits (delta += 32 + clz(i ^ j)), per Karras §4.
- After the tree build, the BVH is flattened into **DFS order with escape
  (skip) links**, giving a *stackless* threaded traversal: hit -> next node
  (i+1), miss -> escape[i].  A **treelet cut** turns every subtree with
  <= leaf_size primitives into one leaf over a *contiguous* range of
  Morton-sorted triangles, so leaf intersection streams dense triangle blocks
  (the TPU replacement for per-lane gather).

The reference repo contains no BVH code to mirror (SURVEY.md §0); the method
is mandated by BASELINE.json:5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tpurt.accel.morton import triangle_morton_codes
from tpurt.accel.sort_ref import sort_pairs
from tpurt.core.geometry import AABB, Triangles

Array = jax.Array

# Sentinel: "no node" / end of traversal.
INVALID = np.int32(-1)  # numpy, not jnp: no backend init at import time


class BVH(struct.PyTreeNode):
    """LBVH over triangles. N = num tris; node ids: internal 0..N-2,
    leaf k <-> node (N-1)+k. Flat arrays are in DFS order with escape links
    (the traversal representation); raw arrays keep the radix-tree topology
    (used by refit and tests).
    """

    # --- radix tree (raw node order) ---
    left: Array  # (N-1,) child node id
    right: Array  # (N-1,)
    parent: Array  # (2N-1,) parent node id; INVALID for root
    first: Array  # (2N-1,) leaf-range start (inclusive, sorted space)
    last: Array  # (2N-1,) leaf-range end (inclusive)
    node_lo: Array  # (2N-1, 3) AABBs (refit output)
    node_hi: Array  # (2N-1, 3)
    # --- Morton ordering ---
    codes: Array  # (N,) sorted morton codes
    tri_order: Array  # (N,) sorted position -> original triangle index
    # --- threaded flat representation (DFS order over the treelet cut) ---
    flat_lo: Array  # (M, 3)
    flat_hi: Array  # (M, 3)
    flat_escape: Array  # (M,) next DFS index on miss / after leaf; -1 = done
    flat_is_leaf: Array  # (M,) bool
    flat_first: Array  # (M,) int32 start into tri_order (leaves)
    flat_count: Array  # (M,) int32 number of tris (leaves)
    dfs: Array  # (2N-1,) raw node id -> flat index (M for dead nodes)
    leaf_size: int = struct.field(pytree_node=False, default=8)
    band: float = struct.field(pytree_node=False, default=0.0)

    @property
    def num_tris(self) -> int:
        return self.codes.shape[0]

    @property
    def num_flat(self) -> int:
        return self.flat_escape.shape[0]

    def slim_for_wide(self) -> "BVH":
        """Drop the arrays only the BINARY engines read (flat threaded
        representation, child/parent links) — ~450 MB at 5M tris.  The BVH8
        path needs just (first, last, tri_order, node boxes) for the RMQ
        refit and entry regathers; the effective single-client HBM budget
        through the axon tunnel is ~4 GB (measured round 5), so the 5M
        fwd_bwd step only fits with the binary half dropped."""
        z3 = jnp.zeros((1, 3), jnp.float32)
        zi = jnp.zeros((1,), jnp.int32)
        return self.replace(
            left=zi, right=zi, parent=zi,
            flat_lo=z3, flat_hi=z3, flat_escape=zi,
            flat_is_leaf=jnp.zeros((1,), bool), flat_first=zi,
            flat_count=zi, dfs=zi,
        )


def _delta(codes: Array, i: Array, j: Array, n: int) -> Array:
    """LCP length of sorted (code, index) keys; -1 when j out of range."""
    valid = (j >= 0) & (j < n)
    jc = jnp.clip(j, 0, n - 1)
    ci = codes[i]
    cj = codes[jc]
    x = ci ^ cj
    ix = i.astype(jnp.uint32) ^ jc.astype(jnp.uint32)
    d = jnp.where(
        x == 0,
        32 + jax.lax.clz(ix),
        jax.lax.clz(x),
    ).astype(jnp.int32)
    return jnp.where(valid, d, -1)


def build_radix_tree(codes: Array):
    """Vectorized Karras 2012: returns (left, right, parent, first, last).

    codes: (N,) sorted uint32 morton codes. Node ids: internal i in [0, N-2],
    leaf k is node (N-1)+k.
    """
    n = codes.shape[0]
    n_int = n - 1
    i = jnp.arange(n_int, dtype=jnp.int32)

    d_raw = _delta(codes, i, i + 1, n) - _delta(codes, i, i - 1, n)
    d = jnp.where(d_raw >= 0, 1, -1).astype(jnp.int32)
    delta_min = _delta(codes, i, i - d, n)

    # Largest l >= 1 with delta(i, i + l*d) > delta_min (monotone predicate).
    # fori_loop over bit positions instead of a 31-step Python unroll: the
    # unrolled form emitted 62 gathers and blew XLA compile time to minutes
    # (VERDICT r1 weak #4); the rolled loop compiles in O(1) graph size.
    def _l_bit(b, acc):
        cand = acc + jnp.left_shift(jnp.int32(1), jnp.int32(30) - b)
        ok = _delta(codes, i, i + cand * d, n) > delta_min
        return jnp.where(ok, cand, acc)

    l = jax.lax.fori_loop(0, 31, _l_bit, jnp.zeros_like(i))
    j = i + l * d
    delta_node = _delta(codes, i, j, n)

    # Largest s in [0, l-1] with delta(i, i + s*d) > delta_node.
    def _s_bit(b, acc):
        cand = acc + jnp.left_shift(jnp.int32(1), jnp.int32(30) - b)
        ok = (cand <= l - 1) & (_delta(codes, i, i + cand * d, n) > delta_node)
        return jnp.where(ok, cand, acc)

    s = jax.lax.fori_loop(0, 31, _s_bit, jnp.zeros_like(i))
    gamma = i + s * d + jnp.minimum(d, 0)

    lo_ij = jnp.minimum(i, j)
    hi_ij = jnp.maximum(i, j)
    leaf_base = jnp.int32(n - 1)
    left = jnp.where(lo_ij == gamma, leaf_base + gamma, gamma)
    right = jnp.where(hi_ij == gamma + 1, leaf_base + gamma + 1, gamma + 1)

    parent = jnp.full((2 * n - 1,), INVALID, dtype=jnp.int32)
    parent = parent.at[left].set(i)
    parent = parent.at[right].set(i)

    first = jnp.concatenate([lo_ij, jnp.arange(n, dtype=jnp.int32)])
    last = jnp.concatenate([hi_ij, jnp.arange(n, dtype=jnp.int32)])
    return left, right, parent, first, last


def _converge(body, init, max_iters: int):
    """Run `body` until its `changed` flag clears (bounded by max_iters)."""

    def cond(state):
        it, changed, _ = state
        return changed & (it < max_iters)

    def step(state):
        it, _, x = state
        x2, changed = body(x)
        return it + 1, changed, x2

    _, _, out = jax.lax.while_loop(cond, step, (0, True, init))
    return out


# Above this leaf count range_minmax_sparse switches to the O(N)-memory
# two-level blocked table: the flat sparse table is (log2(N), N, 6) f32 —
# 2.76 GB transient at 5M tris, the allocation that pushed the 5M fwd_bwd
# step out of HBM (round 5; ADVICE r4 flagged the transient too).
_RMQ_BLOCKED_MIN_N = 1 << 21
_RMQ_B = 32  # block width of the two-level table


def _shift_min(prev: Array, h: int) -> Array:
    if h >= prev.shape[0]:  # window past the array: partner is all +inf
        return prev
    big = jnp.float32(3.0e38)
    return jnp.minimum(
        prev, jnp.concatenate([prev[h:], jnp.full((h, 6), big, prev.dtype)])
    )


def _range_minmax_blocked(box: Array, first: Array, last: Array):
    """Exact two-level RMQ in O(N) memory (min is idempotent and exact in
    f32, so every grouping is BITWISE identical to the flat table):
    - ranges of length <= B answer from dense levels 0..log2(B);
    - longer ranges combine the in-block suffix-min at `first`, the
      in-block prefix-min at `last`, and a sparse table over per-block
      minima for the full blocks in between (empty-safe)."""
    n = box.shape[0]
    big = jnp.float32(3.0e38)
    b = _RMQ_B
    kb = b.bit_length() - 1  # log2(B)

    # dense levels 0..kb (window sizes 1..B)
    dense = jnp.full((kb + 1, n, 6), big, box.dtype).at[0].set(box)
    prev = box
    for k in range(1, kb + 1):
        prev = _shift_min(prev, 1 << (k - 1))
        dense = dense.at[k].set(prev)

    # block structure (pad to whole blocks)
    pad = (-n) % b
    boxp = jnp.concatenate([box, jnp.full((pad, 6), big, box.dtype)])
    nb = boxp.shape[0] // b
    blocks = boxp.reshape(nb, b, 6)
    pmin = jnp.minimum.accumulate(blocks, axis=1).reshape(-1, 6)
    smin = jnp.flip(
        jnp.minimum.accumulate(jnp.flip(blocks, axis=1), axis=1), axis=1
    ).reshape(-1, 6)
    bmin = jnp.min(blocks, axis=1)  # (nb, 6)
    n_blk_levels = max(nb.bit_length(), 1)
    btab = jnp.full((n_blk_levels, nb, 6), big, box.dtype).at[0].set(bmin)
    prev = bmin
    for k in range(1, n_blk_levels):
        prev = _shift_min(prev, 1 << (k - 1))
        btab = btab.at[k].set(prev)
    btab_flat = btab.reshape(-1, 6)

    length = last - first + 1
    kq = 31 - jax.lax.clz(length)

    # short route: two dense windows of size 2^kq (kq <= kb)
    ks = jnp.minimum(kq, kb)
    dense_flat = dense.reshape(-1, 6)
    short = jnp.minimum(
        dense_flat[ks * n + first],
        dense_flat[ks * n + jnp.maximum(last + 1 - (1 << ks), 0)],
    )

    # long route: suffix(first) ∧ prefix(last) ∧ block-table middle
    bl = first // b
    br = last // b
    lo_b = bl + 1
    hi_b = br - 1
    blen = jnp.maximum(hi_b - lo_b + 1, 0)
    has_mid = blen > 0
    kqb = 31 - jax.lax.clz(jnp.maximum(blen, 1))
    g1 = jnp.clip(kqb * nb + lo_b, 0, btab_flat.shape[0] - 1)
    g2 = jnp.clip(kqb * nb + (hi_b + 1 - (1 << kqb)), 0,
                  btab_flat.shape[0] - 1)
    mid = jnp.minimum(btab_flat[g1], btab_flat[g2])
    mid = jnp.where(has_mid[:, None], mid, big)
    long_ = jnp.minimum(jnp.minimum(smin[first], pmin[last]), mid)

    return jnp.where((length <= b)[:, None], short, long_)


def range_minmax_sparse(leaf_lo: Array, leaf_hi: Array,
                        first: Array, last: Array):
    """Box of every [first, last] leaf range via a sparse-table RMQ.

    Karras internal nodes cover CONTIGUOUS sorted-leaf ranges, so a node box
    is a range-min/max over the sorted per-leaf boxes — no tree walk needed.
    Sparse table: level k holds the reduce over windows [i, i + 2^k); any
    range is covered exactly by two overlapping power-of-2 windows (min/max
    are idempotent, so the overlap is harmless and the result is BITWISE
    identical to the bottom-up child-fold).  Build is log2(N) dense passes
    (~3 ms at 1M); queries are two row gathers per id array.

    Measured motivation (v5e, docs/PERF.md round 4): the level-synchronous
    refit walk cost 702 ms at 1M tris (128 full-array gather passes) and was
    2/3 of the whole fwd+bwd fit step; this form is ~21x faster.
    """
    n = leaf_lo.shape[0]
    big = jnp.float32(3.0e38)
    box = jnp.concatenate([leaf_lo, -leaf_hi], axis=-1)  # min-reduce both
    if n > _RMQ_BLOCKED_MIN_N:
        m = _range_minmax_blocked(box, first, last)
        return m[..., 0:3], -m[..., 3:6]
    # Build the (K, n, 6) table by in-place row-plane updates instead of a
    # levels list + jnp.stack: the stack form kept every level alive TWICE
    # (list + stacked copy, ~2x2.8 GB transient at 5M tris — ADVICE r4);
    # .at[k].set lets XLA update one buffer, so peak is table + 2 levels.
    n_levels = 1
    while (1 << n_levels) <= n:
        n_levels += 1
    table = jnp.full((n_levels, n, 6), big, box.dtype).at[0].set(box)
    prev = box
    for k in range(1, n_levels):
        h = 1 << (k - 1)
        shifted = jnp.concatenate(
            [prev[h:], jnp.full((h, 6), big, prev.dtype)]
        )
        prev = jnp.minimum(prev, shifted)
        table = table.at[k].set(prev)
    flat = table.reshape(-1, 6)
    length = last - first + 1
    kq = 31 - jax.lax.clz(length)                  # floor(log2(len)), exact
    a = flat[kq * n + first]
    b = flat[kq * n + (last + 1 - (1 << kq))]
    m = jnp.minimum(a, b)
    return m[..., 0:3], -m[..., 3:6]


def refit_node_aabbs(
    left: Array, right: Array, leaf_lo: Array, leaf_hi: Array, max_depth: int
):
    """Bottom-up AABB propagation by level-synchronous passes.

    The GPU idiom is per-node atomic flags; the TPU idiom is a handful of
    dense gather/min/max passes (one per tree level) until fixpoint — each
    pass is pure vector work. (SURVEY.md §2b #8 reference implementation.)
    """
    n = leaf_lo.shape[0]
    big = jnp.float32(3.0e38)
    lo = jnp.concatenate([jnp.full((n - 1, 3), big), leaf_lo])
    hi = jnp.concatenate([jnp.full((n - 1, 3), -big), leaf_hi])

    def body(state):
        lo, hi = state
        new_lo_i = jnp.minimum(lo[left], lo[right])
        new_hi_i = jnp.maximum(hi[left], hi[right])
        new_lo = jnp.concatenate([new_lo_i, leaf_lo])
        new_hi = jnp.concatenate([new_hi_i, leaf_hi])
        changed = jnp.any(new_lo != lo) | jnp.any(new_hi != hi)
        return (new_lo, new_hi), changed

    lo, hi = _converge(body, (lo, hi), max_depth)
    return lo, hi


def _thread_dfs(
    left: Array,
    right: Array,
    parent: Array,
    first: Array,
    last: Array,
    leaf_size: int,
    max_depth: int,
):
    """Treelet cut + DFS numbering + escape links in O(N log N) closed form.

    Replaces the round-1..4 level-synchronous `_converge` passes (up to
    3 x depth full-array gather sweeps — the dominant exec cost of the 5M-tri
    build, docs/PERF.md round 4 addendum) with one lexicographic sort plus
    bincount/cumsum, using three structural facts about Karras radix trees:

    1. Subtree triangle counts are non-decreasing along ancestor paths, so
       "no ancestor is cuttable" == "the PARENT is not cuttable":
       `live` needs one gather, not a root-down fixpoint.
    2. Node ranges form a laminar family, so a live node y precedes a live
       node x in preorder iff first_y < first_x, or first_y == first_x and
       last_y > last_x (left-spine ancestors).  With Fc[v] = #{live:
       first <= v} and pos = rank in the (first, last) lexicographic sort,
       dfs(x) = Fc[first_x - 1] + (Fc[first_x] - 1 - pos(x)).
    3. The escape target (next preorder node after x's subtree) is simply
       the count of live nodes starting at-or-left-of x's range end:
       escape(x) = Fc[last_x] (or -1 when that equals the live count).

    Returns (dfs, escape_dfs, live, is_eff_leaf):
    - live: node is reachable without passing through a cut node
    - is_eff_leaf: live node whose subtree has <= leaf_size triangles
    - dfs: preorder index among live nodes (dead nodes -> out-of-range M)
    - escape_dfs: DFS index to jump to when skipping this node's subtree
    """
    n = (first.shape[0] + 1) // 2
    m = 2 * n - 1
    size = last - first + 1
    cuttable = size <= leaf_size

    live = (parent < 0) | ~cuttable[jnp.maximum(parent, 0)]
    is_eff_leaf = live & cuttable
    n_live = jnp.sum(live.astype(jnp.int32))

    # Fc[v] = #{live nodes with first <= v}; dead nodes bucket to n (dropped).
    fc = jnp.cumsum(
        jnp.bincount(jnp.where(live, first, n), length=n + 1)[:n]
    ).astype(jnp.int32)

    # Rank of every live node in the (first, last) lexicographic order; dead
    # nodes key to first = n so every live rank is a global rank.
    f2 = jnp.where(live, first, n)
    _, _, order = jax.lax.sort(
        (f2, last, jnp.arange(m, dtype=jnp.int32)), num_keys=2
    )
    pos = jnp.zeros((m,), jnp.int32).at[order].set(
        jnp.arange(m, dtype=jnp.int32)
    )

    fc_lo = jnp.where(first > 0, fc[jnp.maximum(first - 1, 0)], 0)
    dfs = jnp.where(live, fc_lo + fc[first] - 1 - pos, m).astype(jnp.int32)
    esc_raw = fc[last]
    esc = jnp.where(esc_raw < n_live, esc_raw, -1).astype(jnp.int32)
    return dfs, esc, live, is_eff_leaf


def _thread_dfs_ref(
    left: Array,
    right: Array,
    parent: Array,
    first: Array,
    last: Array,
    leaf_size: int,
    max_depth: int,
):
    """Level-synchronous reference for `_thread_dfs` (the rounds-1..4
    production path) — kept as the oracle (tests/unit/test_accel.py)."""
    n = (first.shape[0] + 1) // 2
    m = 2 * n - 1
    size = last - first + 1  # subtree triangle count per node
    is_internal = jnp.arange(m, dtype=jnp.int32) < (n - 1)
    cuttable = size <= leaf_size

    # live: root is live; child live iff parent live and parent not cuttable.
    live = jnp.zeros((m,), bool).at[0].set(True)

    def live_body(lv):
        plv = jnp.where(parent >= 0, lv[jnp.maximum(parent, 0)], False)
        pcut = jnp.where(parent >= 0, cuttable[jnp.maximum(parent, 0)], True)
        new = lv | (plv & ~pcut)
        return new, jnp.any(new != lv)

    live = _converge(live_body, live, max_depth)
    is_eff_leaf = live & cuttable

    # Effective subtree node count (over live nodes): leaf -> 1.
    eff = jnp.where(is_eff_leaf, 1, 0).astype(jnp.int32)

    def eff_body(e):
        child_sum = jnp.zeros((n - 1,), jnp.int32)
        el = e[left]
        er = e[right]
        both = (el > 0) & (er > 0)
        cand = jnp.where(both, el + er + 1, 0)
        child_sum = cand
        new_int = jnp.where(is_eff_leaf[: n - 1], e[: n - 1], child_sum)
        new = jnp.concatenate([new_int, e[n - 1 :]])
        return new, jnp.any(new != e)

    eff = _converge(eff_body, eff, max_depth)

    # DFS preorder + escape, top-down.
    dfs = jnp.full((m,), -1, jnp.int32).at[0].set(0)
    esc = jnp.full((m,), -1, jnp.int32)  # escape of root = -1 (terminate)

    child_of = jnp.maximum(parent, 0)
    is_left_child = left[child_of] == jnp.arange(m, dtype=jnp.int32)

    def dfs_body(state):
        dfs, esc = state
        pd = dfs[child_of]
        pe = esc[child_of]
        p_eff_left = eff[left[child_of]]
        my_dfs = jnp.where(is_left_child, pd + 1, pd + 1 + p_eff_left)
        my_esc = jnp.where(is_left_child, pd + 1 + p_eff_left, pe)
        ready = (parent >= 0) & live & (pd >= 0) & ~is_eff_leaf[child_of]
        new_dfs = jnp.where(ready & (dfs < 0), my_dfs, dfs)
        new_esc = jnp.where(ready & (dfs < 0), my_esc, esc)
        changed = jnp.any(new_dfs != dfs)
        return (new_dfs, new_esc), changed

    dfs, esc = _converge(dfs_body, (dfs, esc), max_depth)
    dfs = jnp.where(live & (dfs >= 0), dfs, m)  # dead -> out-of-range (drop)
    return dfs, esc, live, is_eff_leaf


def build_lbvh(
    tris: Triangles,
    leaf_size: int = 8,
    band: float = 0.0,
    sort_backend: str = "xla",
    max_depth: int = 128,
) -> BVH:
    """Build the full LBVH: morton sort -> radix tree -> refit -> DFS thread.

    band > 0 inflates per-triangle AABBs so the *extended* barycentric-band
    intersections used by the soft/differentiable path (diff/softvis.py) are
    still found by traversal.
    """
    n = tris.num_tris
    v0, v1, v2 = tris.corners()
    tri_lo = jnp.minimum(jnp.minimum(v0, v1), v2)
    tri_hi = jnp.maximum(jnp.maximum(v0, v1), v2)
    if band > 0.0:
        pad = band * (jnp.abs(v1 - v0) + jnp.abs(v2 - v0)) + 1e-7
        tri_lo = tri_lo - pad
        tri_hi = tri_hi + pad

    if n == 1:
        # Degenerate single-triangle scene: one flat leaf.
        z = jnp.zeros((1,), jnp.int32)
        return BVH(
            left=jnp.zeros((0,), jnp.int32),
            right=jnp.zeros((0,), jnp.int32),
            parent=jnp.full((1,), INVALID, jnp.int32),
            first=z,
            last=z,
            node_lo=tri_lo,
            node_hi=tri_hi,
            codes=jnp.zeros((1,), jnp.uint32),
            tri_order=z,
            flat_lo=tri_lo,
            flat_hi=tri_hi,
            flat_escape=jnp.full((1,), -1, jnp.int32),
            flat_is_leaf=jnp.ones((1,), bool),
            flat_first=z,
            flat_count=jnp.ones((1,), jnp.int32),
            dfs=z,
            leaf_size=leaf_size,
            band=band,
        )

    codes = triangle_morton_codes(tris)
    codes, tri_order = sort_pairs(
        codes, jnp.arange(n, dtype=jnp.int32), backend=sort_backend
    )

    left, right, parent, first, last = build_radix_tree(codes)

    leaf_lo = tri_lo[tri_order]
    leaf_hi = tri_hi[tri_order]
    # Node boxes via the sparse-table RMQ over the contiguous sorted-leaf
    # ranges — bitwise-equal to the level-sync fold but O(log N) dense
    # passes instead of O(depth) full-array gather passes (the build's
    # largest exec cost at 5M tris; accel/refit.py has the measurements).
    node_lo, node_hi = range_minmax_sparse(leaf_lo, leaf_hi, first, last)

    dfs, esc, live, is_eff_leaf = _thread_dfs(
        left, right, parent, first, last, leaf_size, max_depth
    )

    m = 2 * n - 1
    idx = dfs  # out-of-range m for dead nodes -> dropped by scatter
    flat_lo = jnp.zeros((m, 3), jnp.float32).at[idx].set(node_lo, mode="drop")
    flat_hi = jnp.zeros((m, 3), jnp.float32).at[idx].set(node_hi, mode="drop")
    flat_escape = jnp.full((m,), -1, jnp.int32).at[idx].set(esc, mode="drop")
    flat_is_leaf = jnp.zeros((m,), bool).at[idx].set(is_eff_leaf, mode="drop")
    flat_first = jnp.zeros((m,), jnp.int32).at[idx].set(first, mode="drop")
    flat_count = jnp.zeros((m,), jnp.int32).at[idx].set(
        jnp.where(is_eff_leaf, last - first + 1, 0), mode="drop"
    )

    return BVH(
        left=left,
        right=right,
        parent=parent,
        first=first,
        last=last,
        node_lo=node_lo,
        node_hi=node_hi,
        codes=codes,
        tri_order=tri_order,
        flat_lo=flat_lo,
        flat_hi=flat_hi,
        flat_escape=flat_escape,
        flat_is_leaf=flat_is_leaf,
        flat_first=flat_first,
        flat_count=flat_count,
        dfs=dfs,
        leaf_size=leaf_size,
        band=band,
    )
