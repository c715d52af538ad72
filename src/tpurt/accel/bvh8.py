"""Wide (8-ary) BVH layout for the TPU traversal kernel (SURVEY.md §2b #10).

Why wide nodes on TPU: the round-2 Pallas walk spends ~1.2 us of SERIAL work
per binary-node visit, dominated by one-hot *lane* extractions (each a ~7-step
cross-lane reduction) of the node's scalars from lane-packed rows
(docs/PERF.md).  The TPU-native fix is to amortize that fixed per-visit cost
over 8 box tests: one wide node's record is HALF of one 128-lane f32 row, so
one dynamic ROW load (legal for f32 tiles) yields all 8 children's AABBs at
*static* lane offsets — cheap scalar extracts, zero cross-lane reductions —
followed by 8 vectorized slab tests against the whole ray packet.

Layout (one wide node = 64 lanes; two wide nodes per (1, 128) f32 row):
  lanes 6c..6c+5 : child c AABB (lox, loy, loz, hix, hiy, hiz), c in 0..7
  lanes 48+c     : child c meta, an int32 BITCAST into the f32 lane:
                     >= 0 : index of the child wide node
                     <  0 : fat leaf, ~meta == (row0 << 3) | (n_rows - 1)
  lanes 56..61   : the wide node's OWN AABB (its anchor's box)
  lane  62       : escape wide id (int32 bitcast; -1 terminates)
  lane  63       : 1 if the node has internal (wide) children, else 0
Empty child slots get the point box lo = hi = +3e38, which fails every slab
test for every ray direction (t_near = 3e38 > any t_upper <= T_MAX for
positive inv_d; t_far = -3e38 for negative), so empties need no meta flag.

Traversal is STACKLESS: wide nodes are stored in DFS preorder with escape
links (hit -> w+1 when internal children exist, miss/leaf-only -> escape),
exactly the scalar-cursor structure the binary kernel proved runs on real
TPUs — because the alternative (a traversal stack) needs dynamic-index SMEM
stores inside the while body, which hang/fault Mosaic kernels on v5e
(measured; dynamic SMEM stores in fori loops are fine, in while loops they
are not).  A wide node tests its OWN box on arrival plus its 8 children's
boxes for leaf gating; internal children self-test when the cursor reaches
them, so a failing subtree costs exactly one extra visit.

Fat leaves & universal triangle rows: triangle rows are the fixed partition
of the MORTON-SORTED triangles into 8s — row r holds sorted tris [8r, 8r+8)
as 8 x (v0, e1, e2) in lanes 0..71 plus their original ids bitcast into lanes
72..79.  A leaf entry covers a contiguous sorted range [first, last] and
simply references rows first//8 .. last//8 (<= 3 rows at FAT_TRIS=16): leaf
fetches become ONE contiguous (n_rows, 128) DMA, and boundary rows may test a
few triangles outside the range — harmless, since the accept tests are
self-contained and the (t, tri-id) selection is order- and
superset-invariant (closest/occlusion; the k-nearest kernel dedups by id).

Collapse (host-side, build time): topology is frozen after the LBVH build —
the fit loop only refits BOXES (refit_wide, jittable) — so the greedy
collapse runs in numpy once per scene.  Greedy rule: from each anchor,
repeatedly split the largest-count frontier node until 8 entries or every
frontier node has <= FAT_TRIS triangles (those become fat leaves).  Splitting
largest-first keeps wide nodes full (W ~= #fat_leaves / 7), which is what
bounds the VMEM footprint; a fixed every-3-levels cut degenerates to
half-empty wides whenever leaf depth aligns badly.

The reference repo has no BVH code of any kind to mirror (SURVEY.md §0); the
method is mandated by BASELINE.json:5.
"""

from __future__ import annotations

import heapq

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from tpurt.accel.lbvh import BVH
from tpurt.core.geometry import Triangles

Array = jax.Array

ENTRIES = 8          # children per wide node
FAT_TRIS = 16        # max triangles in a fat-leaf entry
R_MAX_ROWS = 3       # max tri rows a fat leaf can span: ceil((16-1+7)/8)+1
TRIS_PER_ROW = 8     # 8 tris x 9 floats = 72 lanes (+8 id lanes)
EMPTY_BOX = 3e38     # point box at +inf: fails every slab test


def encode_lane_i32(v: Array) -> Array:
    """int32 -> f32 whose BIT PATTERN survives every TPU f32 data path.

    Raw small positive ints bitcast to f32 are DENORMALS, and the TPU
    flushes denormals somewhere between packing and the kernel's row load
    (measured on v5e: tri-id lanes read back as zeros while the NaN-space
    negative metas survive bit-exactly).  Encoding v as
    0xFF000000 | ((v + 1) & 0xFFFFFF) makes every value a negative NORMAL
    f32 for v >= -1 (exp 0xFE) and a quiet NaN for -2^22 < v < -1 —
    both preserved classes.  Valid range: -2^22 < v < 2^23 - 1 (wide ids,
    escapes, fat-leaf metas at <= ~4M tris/chip, tri ids at <= ~8M).
    Decode (kernel side): sign-extend the low 24 bits, minus 1."""
    enc = jnp.int32(0xFF000000 - 2**32) | ((v + 1) & jnp.int32(0x00FFFFFF))
    return jax.lax.bitcast_convert_type(enc.astype(jnp.int32), jnp.float32)


def decode_lane_i32(e: Array) -> Array:
    """Inverse of encode_lane_i32 given the BITCAST-to-i32 lane value."""
    d24 = e & jnp.int32(0x00FFFFFF)
    return ((d24 << 8) >> 8) - 1  # arithmetic shift sign-extends bit 23


class WideBVH(struct.PyTreeNode):
    """Traversal-ready 8-wide BVH (DFS order, escape-threaded).

    wrow:       (ceil(W/2) padded to 8, 128) f32 — packed wide-node rows.
    tri_rows:   (ceil(N/8) + pad, 128) f32 — universal sorted-order
                triangle rows (+ zero pad rows so leaf DMAs may overshoot).
    entry_node: (W, 8) i32 — raw binary node id per entry (-1 empty); the
                refit path regathers entry boxes from the refit BVH through
                this (frozen) topology.
    entry_meta: (W, 8) i32 — frozen meta words (encoding above).
    own_node:   (W,) i32 — the wide node's anchor (raw binary node id).
    escape:     (W,) i32 — DFS escape wide id (-1 terminates).
    has_int:    (W,) i32 — 1 when the wide node has internal children.
    row_tids:   (ceil(N/8), 8) i32 — original tri id per row slot (-1 pad);
                the refit path regathers row vertices through this.
    """

    wrow: Array
    tri_rows: Array
    entry_node: Array
    entry_meta: Array
    own_node: Array
    escape: Array
    has_int: Array
    row_tids: Array
    band: float = struct.field(pytree_node=False, default=0.0)

    @property
    def num_wides(self) -> int:
        return self.entry_node.shape[0]

    @property
    def num_rows(self) -> int:
        return self.row_tids.shape[0]


def _leaf_meta(first: int, last: int) -> int:
    r0 = first // TRIS_PER_ROW
    n_rows = last // TRIS_PER_ROW - r0 + 1
    assert 1 <= n_rows <= R_MAX_ROWS
    return ~((r0 << 3) | (n_rows - 1))


def collapse8(
    left: np.ndarray,
    right: np.ndarray,
    first: np.ndarray,
    last: np.ndarray,
    fat_tris: int = FAT_TRIS,
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy binary->8-wide collapse on the raw radix tree (host numpy).

    Returns (entry_node (W, 8) i32, entry_meta (W, 8) i32).  Wide node 0 is
    the root.  Deterministic: heap ties break on node id, entries are ordered
    by Morton range start.
    """
    n = (first.shape[0] + 1) // 2
    if n == 1 or int(last[0] - first[0] + 1) <= fat_tris:
        en = np.full((1, ENTRIES), -1, np.int32)
        em = np.zeros((1, ENTRIES), np.int32)
        en[0, 0] = 0  # root node (leaf when n == 1, internal otherwise)
        em[0, 0] = _leaf_meta(0, n - 1)
        return (en, em, np.zeros(1, np.int32),
                np.full(1, -1, np.int32), np.zeros(1, np.int32))

    count = (last.astype(np.int64) - first.astype(np.int64)) + 1
    leaf_base = n - 1
    anchors = [0]  # provisional (BFS) wide id == position in this list
    wide_entries: list[list[tuple[int, int, bool]]] = []
    qi = 0
    while qi < len(anchors):
        a = anchors[qi]
        qi += 1
        # frontier: heap of splittable nodes (-count, node) + terminal list
        splits: list[tuple[int, int]] = [(-int(count[a]), a)]
        terms: list[int] = []
        total = 1
        while splits and total < ENTRIES:
            _, node = heapq.heappop(splits)
            total -= 1
            for ch in (int(left[node]), int(right[node])):
                if ch < leaf_base and count[ch] > fat_tris:
                    heapq.heappush(splits, (-int(count[ch]), ch))
                else:
                    terms.append(ch)
                total += 1
        ents: list[tuple[int, int, bool]] = []
        for _, node in splits:  # leftover splittables -> child wide nodes
            ents.append((node, len(anchors), False))
            anchors.append(node)
        for node in terms:  # small subtrees / raw leaves -> fat leaves
            ents.append((node, -1, True))
        ents.sort(key=lambda e: int(first[e[0]]))
        wide_entries.append(ents)

    # DFS preorder re-numbering + escape links (stackless traversal).
    w = len(wide_entries)
    kids = [[wid for (_, wid, lf) in ents if not lf] for ents in wide_entries]
    size = np.ones(w, np.int64)
    for wi in range(w - 1, -1, -1):  # children have larger BFS ids
        for c in kids[wi]:
            size[wi] += size[c]
    new_of = np.empty(w, np.int32)
    esc = np.empty(w, np.int32)
    nxt = 0
    stack = [0]
    while stack:
        wi = stack.pop()
        new_of[wi] = nxt
        e = nxt + size[wi]
        esc[nxt] = e if e < w else -1
        nxt += 1
        stack.extend(reversed(kids[wi]))  # preorder, entry order preserved

    en = np.full((w, ENTRIES), -1, np.int32)
    em = np.zeros((w, ENTRIES), np.int32)
    own = np.empty(w, np.int32)
    has_int = np.zeros(w, np.int32)
    for wi, ents in enumerate(wide_entries):
        ni = int(new_of[wi])
        own[ni] = anchors[wi]
        for e, (node, wid, is_leaf) in enumerate(ents):
            en[ni, e] = node
            if is_leaf:
                em[ni, e] = _leaf_meta(int(first[node]), int(last[node]))
            else:
                em[ni, e] = new_of[wid]
                has_int[ni] = 1
    return en, em, own, esc, has_int


def rows_from_tids(tris: Triangles, row_tids: Array) -> Array:
    """(R, 8) tri ids -> (R + R_MAX_ROWS, 128) packed rows (jittable; the
    refit path after vertices moved)."""
    r = row_tids.shape[0]
    ok = row_tids >= 0
    g = jnp.maximum(row_tids, 0)
    v0, v1, v2 = tris.corners()
    tv0 = jnp.where(ok[..., None], v0[g], 0.0)
    te1 = jnp.where(ok[..., None], v1[g] - v0[g], 0.0)
    te2 = jnp.where(ok[..., None], v2[g] - v0[g], 0.0)
    dat = jnp.concatenate([tv0, te1, te2], axis=-1).reshape(r, 72)
    idf = encode_lane_i32(row_tids)  # (R, 8), denormal-safe encoding
    rows = jnp.concatenate(
        [dat, idf, jnp.zeros((r, 128 - 80), jnp.float32)], axis=-1
    )
    # Overshoot pad: a fat-leaf DMA always copies R_MAX_ROWS rows; rows past
    # n_rows are skipped by the kernel and pad rows are all-zero (det == 0
    # fails Möller-Trumbore for every ray).  Then round up to a full
    # (8, 128) f32 tile: dynamic row loads from sub-tile VMEM arrays fault
    # on hardware (see _assemble_wrow).
    padded = r + R_MAX_ROWS
    return jnp.pad(rows, ((0, R_MAX_ROWS + ((-padded) % 8)), (0, 0)))


def _assemble_wrow(
    node_lo: Array,
    node_hi: Array,
    entry_node: Array,
    entry_meta: Array,
    own_node: Array,
    escape: Array,
    has_int: Array,
) -> Array:
    """Boxes + metas + own box + escape/flags -> packed (ceil(W/2), 128)
    f32 rows (jittable)."""
    w = entry_node.shape[0]
    valid = entry_node >= 0
    g = jnp.maximum(entry_node, 0)
    lo = jnp.where(valid[..., None], node_lo[g], EMPTY_BOX)  # (W, 8, 3)
    hi = jnp.where(valid[..., None], node_hi[g], EMPTY_BOX)
    box = jnp.concatenate([lo, hi], axis=-1).reshape(w, 48)
    meta_f = encode_lane_i32(entry_meta)  # denormal-safe lane encoding
    own_box = jnp.concatenate(
        [node_lo[own_node], node_hi[own_node]], axis=-1
    )  # (W, 6)
    esc_f = encode_lane_i32(escape)[:, None]
    flag_f = encode_lane_i32(has_int)[:, None]
    row64 = jnp.concatenate([box, meta_f, own_box, esc_f, flag_f], axis=-1)
    row64 = jnp.pad(row64, (((0, (-w) % 2), (0, 0))))
    wrow = row64.reshape(-1, 128)
    # Pad to a full (8, 128) f32 tile multiple: dynamically row-indexing a
    # sub-tile (e.g. (1, 128)) VMEM array faults the kernel on hardware
    # (measured on v5e with tiny scenes whose whole tree is one row).
    return jnp.pad(wrow, ((0, (-wrow.shape[0]) % 8), (0, 0)))


def pack_wide(
    tris: Triangles,
    bvh: BVH,
    entry_node: Array,
    entry_meta: Array,
    own_node: Array,
    escape: Array,
    has_int: Array,
) -> WideBVH:
    """Assemble the device arrays for a collapsed topology (jittable)."""
    nt = bvh.tri_order.shape[0]
    r = -(-nt // TRIS_PER_ROW)
    s = jnp.arange(r * TRIS_PER_ROW)
    inr = s < nt
    row_tids = jnp.where(
        inr, bvh.tri_order[jnp.minimum(s, nt - 1)], -1
    ).reshape(r, TRIS_PER_ROW).astype(jnp.int32)
    return WideBVH(
        wrow=_assemble_wrow(bvh.node_lo, bvh.node_hi, entry_node, entry_meta,
                            own_node, escape, has_int),
        tri_rows=rows_from_tids(tris, row_tids),
        entry_node=entry_node,
        entry_meta=entry_meta,
        own_node=own_node,
        escape=escape,
        has_int=has_int,
        row_tids=row_tids,
        band=bvh.band,
    )


def build_wide(tris: Triangles, bvh: BVH, fat_tris: int = FAT_TRIS) -> WideBVH:
    """Collapse (host) + pack (device).  One device->host sync of the four
    small topology arrays; topology is frozen afterwards (refit_wide only
    touches boxes/rows)."""
    left, right, first, last = jax.device_get(
        (bvh.left, bvh.right, bvh.first, bvh.last)
    )
    en, em, own, esc, has_int = collapse8(
        np.asarray(left), np.asarray(right),
        np.asarray(first), np.asarray(last), fat_tris,
    )
    return jax.jit(pack_wide)(
        tris, bvh, jnp.asarray(en), jnp.asarray(em), jnp.asarray(own),
        jnp.asarray(esc), jnp.asarray(has_int),
    )


def refit_wide(wide: WideBVH, bvh: BVH, tris: Triangles) -> WideBVH:
    """Jittable box/row update after vertices moved: new entry boxes come
    from an already-refit BVH (accel/refit.py); topology stays frozen."""
    return wide.replace(
        wrow=_assemble_wrow(
            bvh.node_lo, bvh.node_hi, wide.entry_node, wide.entry_meta,
            wide.own_node, wide.escape, wide.has_int,
        ),
        tri_rows=rows_from_tids(tris, wide.row_tids),
    )


def wide_bytes(wide: WideBVH) -> int:
    return int(wide.wrow.size) * 4


def tri_rows_bytes(wide: WideBVH) -> int:
    return int(wide.tri_rows.size) * 4
