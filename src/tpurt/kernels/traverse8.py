"""Pallas BVH8 traversal kernels — the production TPU engine (SURVEY §2b #10).

Round-2's binary walk paid ~1.2 us of serial work per node visit, dominated
by one-hot LANE extractions (~7-step cross-lane reductions each) of node
scalars plus a full-tile `any()` per visit (docs/PERF.md).  This engine
restructures traversal around what the hardware does cheaply:

- ONE dynamic f32 row load per visit yields a whole wide node: 8 children's
  AABBs + metas + the node's own AABB + escape link, all at STATIC lane
  offsets (accel/bvh8.py layout) — static lane extracts compile to cheap
  scalar moves, no cross-lane one-hot reductions at all.
- 8 slab tests per visit (FMA form, o*inv precomputed per packet) are pure
  VPU throughput over the (sub, 128) ray tile; their masks accumulate into
  ONE i32 bit-mask tile whose reduction is log2 static `pltpu.roll`s — one
  reduction per visit instead of one `any()` per binary node.
- Two traversal drivers (measured on v5e, docs/PERF.md round 3):
  * 'stack' (default): a VMEM ROW stack — push = unconditional select-store
    of a dynamic row, the one store form that works inside while bodies on
    v5e (dynamic SMEM stores hang there; they work in fori_loop).  Skips
    failing subtrees entirely: 8.3x faster than escape at 1M tris.
  * 'escape': stackless DFS escape threading with a scalar cursor and a
    9th own-box slab per visit — the r2-proven shape, kept as fallback.
- Fat-leaf fetches are ONE contiguous (<=3, 128) row read (VMEM tier) or
  one async DMA per passing leaf child, started for ALL passing children
  before any is consumed so up to 8 copies overlap (HBM tier).
- The whole packed BVH8 is f32: ~36 B/node-equivalent fits 1M-tri scenes in
  VMEM without the bf16 tier whose dynamic row loads Mosaic rejects
  (VERDICT r2 missing #1).
- grid packets are `dimension_semantics=("parallel",)` so megacore splits
  them across both TensorCores.

Hardware legality notes baked in below (each measured on v5e this round):
  * rolls must stay on full (8k, 128) tile shapes (sub-tile rolls SIGABRT
    the Mosaic lowering);
  * dynamic row loads are issued even inside a false `@pl.when` — indices
    must be clamped valid unconditionally;
  * dynamically row-indexed VMEM arrays must span >= one full (8, 128)
    tile (accel/bvh8 pads).

Semantics: identical accept tests and lexicographic (t, tri-id) selection
as accel/packet (the oracle) — selection is visit-order- and
superset-invariant, so universal 8-aligned tri rows (which may test a few
out-of-leaf triangles) and escape order cannot change results; the
k-nearest insert dedups by id since boundary rows can be shared by
adjacent fat leaves.

The reference repo has no kernels of any kind to mirror (SURVEY.md §0); the
target is BASELINE.json:5 (>=100M primary rays/s/chip at 1M tris).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.accel.bvh8 import (
    ENTRIES,
    R_MAX_ROWS,
    WideBVH,
    decode_lane_i32,
    tri_rows_bytes,
    wide_bytes,
)
from tpurt.accel.intersect import DEFAULT_T_MIN, DET_EPS
from tpurt.core.geometry import Hit, Rays, T_MAX, Triangles
from tpurt.kernels.traverse import (
    VMEM_BUDGET_BYTES,
    _interpret,
    _mt_scalar_tri,
    _pad_tiles,
    _ray_spec,
    _safe_inv,
)

Array = jax.Array

LANE = 128
DEFAULT_SUB8 = 16  # (sub, 128) rays per packet walk
STACKV = 192  # VMEM stack rows: wide-tree depth (<=24 at 8M tris) x <=7 pushes
# Measured on v5e (full frames, morton order): the stack walk skips failing
# subtrees entirely and beats escape threading 8.3x at 1M tris (42.1M vs
# 5.1M rays/s) and 1.6x on bunny — escape survives as the fallback shape
# and for comparison (docs/PERF.md round 3).
DEFAULT_WALK = "stack"  # 'stack' (VMEM row stack) | 'escape' (stackless)


def _auto_sub(wide: WideBVH) -> int:
    """Packet height: bigger tiles amortize per-visit work on big scenes
    (measured: sub=64 best at 1M tris, sub=32 on 70K)."""
    return 64 if wide.num_wides > 8192 else 32
# VMEM headroom reserved for ray tiles, leaf DMA scratch and double buffers.
_SCRATCH_HEADROOM = 256 * 1024
# The wide engine's own VMEM ceiling: a v5e TensorCore has 128 MB of VMEM,
# and the HBM-triangle tier keeps ONLY the wide-node rows resident (~39 MB
# at 5M tris) — the binary engine's conservative 13 MB budget (shared with
# its triangle rows) would wrongly reject the 5M config (BASELINE.json:11).
# Validated on-chip at 5M tris (docs/PERF.md round 4).
VMEM_BUDGET8_BYTES = 96 * 1024 * 1024


def plan8(wide: WideBVH):
    """(tri_in_hbm,) or None when even the HBM-triangle tier can't host the
    wide rows in VMEM."""
    wb, tb = wide_bytes(wide), tri_rows_bytes(wide)
    if wb + tb + _SCRATCH_HEADROOM <= VMEM_BUDGET_BYTES:
        return (False,)
    if wb + _SCRATCH_HEADROOM <= VMEM_BUDGET8_BYTES:
        return (True,)
    return None


def _or_reduce_bits(hitm: Array, interpret: bool) -> Array:
    """(sub, LANE) i32 bit-mask tile -> scalar OR of every element.

    Compiled path: log2 static circular `pltpu.roll`s + ORs, every
    intermediate on the full tile-legal (sub, 128) shape — rolls on
    1-sublane shapes SIGABRT the Mosaic lowering ("limits[i] <= dim(i)",
    measured on v5e), and one-hot reductions are the measured r2
    bottleneck."""
    if interpret:
        return jax.lax.reduce(
            hitm, jnp.int32(0), jax.lax.bitwise_or, tuple(range(hitm.ndim))
        )
    v = hitm
    sh = 1
    while sh < LANE:
        v = v | pltpu.roll(v, sh, 1)
        sh *= 2
    sh = 1
    while sh < v.shape[0]:
        v = v | pltpu.roll(v, sh, 0)
        sh *= 2
    return v[0, 0]


def _slab8(oix, oiy, oiz, ix, iy, iz, lox, loy, loz, hix, hiy, hiz, t_min, t_upper):
    """Slab test of the whole (sub, LANE) ray tile vs one scalar AABB.

    Takes PRE-MULTIPLIED o*inv tiles (oix = ox*ix, computed once per
    packet): (lo - o)*inv == lo*inv - o*inv, one FMA per bound instead of
    subtract+multiply — 6 fewer VPU ops per slab, the hot loop's unit."""
    tx0, tx1 = lox * ix - oix, hix * ix - oix
    ty0, ty1 = loy * iy - oiy, hiy * iy - oiy
    tz0, tz1 = loz * iz - oiz, hiz * iz - oiz
    t_near = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
    )
    t_far = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), t_upper),
    )
    return t_near <= t_far


def _node_row(wrow, w):
    """One wide node: (rd, rdi) static-lane scalar readers for its 64-lane
    half of the dynamically loaded row."""
    row = wrow[w // 2, :]
    rowi = jax.lax.bitcast_convert_type(row, jnp.int32)
    half = w % 2

    def rd(k):
        return jnp.where(half == 0, row[k], row[64 + k])

    def rdi(k):
        return jnp.where(half == 0, rowi[k], rowi[64 + k])

    return rd, rdi


def _visit_mask(rd, oix, oiy, oiz, ix, iy, iz, t_min, upper, interpret,
                stack_walk, live=None):
    """Bit c+1: any ray passes child c's box — the leaf/push gates.  Bit 0
    (escape walk only): any ray passes the node's OWN box.  One reduction
    total.  The stack walk skips the own-box slab entirely: children boxes
    are contained in it, so own & boxed_c == boxed_c, and pushed-then-stale
    subtrees are pruned by their own children's tests against the shrunken
    t_best — the own test is pure waste there (1 of 9 slabs).
    live (stack walk only): a (sub, LANE) bool tile ORed into bit 0 so the
    caller can drain the whole walk (sp -> 0) once no ray remains live —
    the occlusion kernel's all-blocked early exit."""
    if stack_walk:
        own = None
        if live is None:
            hitm = jnp.zeros(upper.shape, jnp.int32)
        else:
            hitm = jnp.where(live, jnp.int32(1), jnp.int32(0))
    else:
        own = _slab8(
            oix, oiy, oiz, ix, iy, iz,
            rd(56), rd(57), rd(58), rd(59), rd(60), rd(61),
            t_min, upper,
        )
        hitm = jnp.where(own, jnp.int32(1), jnp.int32(0))
    for c in range(ENTRIES):
        boxed = _slab8(
            oix, oiy, oiz, ix, iy, iz,
            rd(6 * c), rd(6 * c + 1), rd(6 * c + 2),
            rd(6 * c + 3), rd(6 * c + 4), rd(6 * c + 5),
            t_min, upper,
        )
        if not stack_walk:
            boxed = boxed & own
        hitm = hitm | jnp.where(boxed, jnp.int32(1 << (c + 1)), jnp.int32(0))
    return _or_reduce_bits(hitm, interpret)


def _leaf_dma(rows, row_s, sem, c, row0, max_rows):
    return pltpu.make_async_copy(
        rows.at[pl.ds(row0, max_rows), :],
        row_s.at[pl.ds(c * max_rows, max_rows), :],
        sem.at[c],
    )


def _start_leaf_dmas(metas, rows, row_s, sem, max_rows):
    """Kick off the fat-leaf row copies for EVERY leaf child, before the
    slab phase even runs: the copies then overlap the visit's ~1 us of
    vector work instead of serializing after it (measured: the HBM tier
    was latency-bound, insensitive to slab-cost cuts).  Unconditional on
    the pass mask — wasted child fetches cost bandwidth (<=12 KB/visit,
    far under HBM), and the matching UNCONDITIONAL waits in the child loop
    keep every semaphore balanced regardless of which children pass."""
    for c in range(ENTRIES):
        m = metas[c]

        @pl.when(m < 0)
        def _(c=c, m=m):
            _leaf_dma(rows, row_s, sem, c, jnp.maximum((~m) >> 3, 0),
                      max_rows).start()


def _next_cursor(cur, bits, esc, has_i):
    """Escape-threaded DFS step: descend to cur+1 (the first internal child)
    only when the own box passed and internal children exist."""
    return jnp.where(((bits & 1) > 0) & (has_i > 0), cur + 1, esc)


def _wide_specs(tri_in_hbm: bool):
    space = pl.ANY if tri_in_hbm else pltpu.VMEM
    return [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wrow
        pl.BlockSpec(memory_space=space),       # tri_rows
    ]


def _dma_scratch(tri_in_hbm: bool, max_rows: int):
    if not tri_in_hbm:
        return []
    return [
        pltpu.VMEM((ENTRIES * max_rows, LANE), jnp.float32),
        pltpu.SemaphoreType.DMA((ENTRIES,)),
    ]


def _walk_scratch(stack_walk: bool, tri_in_hbm: bool, max_rows: int):
    stk = [pltpu.VMEM((STACKV, LANE), jnp.int32)] if stack_walk else []
    return stk + _dma_scratch(tri_in_hbm, max_rows)


def _stack_push(stk, sp, m, push):
    """Unconditional select-store push: the only store form that works in a
    while body on v5e (dynamic SMEM stores hang; predicated dynamic VMEM
    stores are untested — the probe-proven pattern is read-modify-write of
    a dynamic VMEM row).  Entry = a (LANE,) row filled with the wide id."""
    idx = jnp.minimum(sp, STACKV - 1)
    new = jnp.where(push, jnp.full((LANE,), m, jnp.int32), stk[idx])
    stk[idx] = new
    return sp + jnp.where(push, jnp.int32(1), jnp.int32(0))


# Optimal 19-comparator sorting network for 8 elements (Knuth TAOCP v3).
_SORT8 = (
    (0, 1), (2, 3), (4, 5), (6, 7),
    (0, 2), (1, 3), (4, 6), (5, 7),
    (1, 2), (5, 6), (0, 4), (3, 7),
    (1, 5), (2, 6),
    (1, 4), (3, 6),
    (2, 4), (3, 5),
    (3, 4),
)


def _ordered_pushes(stk, sp, keys, metas, pushes):
    """Push the passing internal children in DESCENDING key order (key =
    child-box center projected on the packet's representative ray
    direction), so the LIFO pop walks subtrees NEAR-FIRST and the t_best
    upper bound tightens as early as possible.  All scalar-core work: a
    static 19-comparator sort network on (key, meta, push) triples
    (~130 scalar ops/visit, overlapped with the next visit's vector work).
    Non-pushed slots carry key = -inf and sink to the end; their
    _stack_push is a no-op select."""
    neg = jnp.float32(-3e38)
    k = [jnp.where(p, kk, neg) for kk, p in zip(keys, pushes)]
    m = list(metas)
    p = list(pushes)
    for i, j in _SORT8:
        swap = k[i] < k[j]
        k[i], k[j] = (jnp.where(swap, k[j], k[i]),
                      jnp.where(swap, k[i], k[j]))
        m[i], m[j] = (jnp.where(swap, m[j], m[i]),
                      jnp.where(swap, m[i], m[j]))
        p[i], p[j] = (jnp.where(swap, p[j], p[i]),
                      jnp.where(swap, p[i], p[j]))
    for c in range(ENTRIES):
        sp = _stack_push(stk, sp, m[c], p[c])
    return sp


def _stack_pop(stk, sp):
    # Clamp the read row to the scratch extent: build_wide guarantees
    # sp <= max_stack <= STACKV (asserted in _check_stack), but an
    # out-of-bounds dynamic VMEM row read on a corrupted sp would fault the
    # worker rather than just mis-traverse (ADVICE r3).
    idx = jnp.clip(sp - 1, 0, STACKV - 1)
    top = stk[idx][0]
    nxt = jnp.where(sp > 0, top, jnp.int32(-1))
    return nxt, jnp.maximum(sp - 1, 0)


def _check_stack(wide: WideBVH, walk: str) -> None:
    """The VMEM row stack must hold the topology's worst case: _stack_push
    clamps to STACKV-1, so overflow would silently DROP subtrees (wrong
    hits), not crash.  max_stack == 0 means the WideBVH was constructed
    outside build_wide (tests, pre-r4 layouts) — compute the bound from the
    topology on the fly rather than skipping the guard (ADVICE r4); only a
    traced entry_meta (wide passed through jit) is exempt, since the bound
    needs concrete values and jitted callers go through build_wide anyway."""
    if walk != "stack":
        return
    bound = wide.max_stack
    if bound == 0 and not isinstance(wide.entry_meta, jax.core.Tracer):
        from tpurt.accel.bvh8 import stack_bound

        bound = stack_bound(jax.device_get(wide.entry_meta))
    if bound > STACKV:
        raise RuntimeError(
            f"BVH8 worst-case stack occupancy {bound} exceeds the "
            f"kernel stack ({STACKV} rows); rebuild with smaller fat_tris or "
            f"use walk='escape'"
        )


def _run_walk(visit, stack_walk: bool, stk):
    """Drive `visit(cur, sp) -> (bits, esc, has_i, sp)` to termination via
    the selected traversal (VMEM row stack or escape threading)."""
    if stack_walk:
        def body(carry):
            cur, sp = carry
            _, _, _, sp = visit(cur, sp)
            return _stack_pop(stk, sp)

        jax.lax.while_loop(lambda s: s[0] >= 0, body,
                           (jnp.int32(0), jnp.int32(0)))
    else:
        def body(cur):
            bits, esc, has_i, _ = visit(cur, jnp.int32(0))
            return _next_cursor(cur, bits, esc, has_i)

        jax.lax.while_loop(lambda cur: cur >= 0, body, jnp.int32(0))


_MOSAIC_DEFAULT_VMEM = 16 * 1024 * 1024


def _compiler_params(wide: WideBVH, tri_in_hbm: bool, io_tiles: int = 0,
                     sub: int = 0):
    # vmem_limit_bytes: Mosaic's default scoped-VMEM limit is 16 MB — a
    # compiler default, not hardware (v5e has 128 MB).  The 5M-tri config's
    # wide-node rows are ~45 MB and must be VMEM-resident for dynamic row
    # loads (BASELINE.json:11).  Raise the limit ONLY when the resident
    # arrays + double-buffered I/O tiles actually exceed the default: a
    # blanket raise changes Mosaic's allocation strategy for small layouts
    # too and cost the 1M VMEM tier ~2x (32.8M -> 17.9M rays/s, measured on
    # v5e — docs/PERF.md round 4).  io_tiles counts the kernel's (sub, 128)
    # in+out blocks: the shade_out variant's 13 outputs overflowed the
    # default by <1 MB at the 1M HBM tier (round 5).
    need = wide_bytes(wide) + (0 if tri_in_hbm else tri_rows_bytes(wide))
    need += 4 * _SCRATCH_HEADROOM
    # Mosaic keeps ~4 buffers per streamed block (in/out pipelining);
    # measured: the 13-output shade variant needs 16.96 MB at the 1M HBM
    # tier while the 10-block plain closest fits the 16 MB default.
    need += 4 * io_tiles * sub * LANE * 4
    # The estimate runs ~5-10% under Mosaic's true scoped allocation when
    # the kernel sits in a larger XLA module (measured: the plain closest
    # kernel wants 16.12 MB inside the fused render graph but compiled
    # standalone at the 16 MB default), so trigger the raise with 10%
    # headroom rather than at the exact default.
    if need + need // 10 <= _MOSAIC_DEFAULT_VMEM:
        return pltpu.CompilerParams(dimension_semantics=("parallel",))
    return pltpu.CompilerParams(
        dimension_semantics=("parallel",),
        vmem_limit_bytes=min(max(need + need // 4, 24 * 1024 * 1024),
                             110 * 1024 * 1024),
    )


def _prep(rays: Rays, wide: WideBVH, sub: int, *extra):
    """Common wrapper front half: stop-grad, pad to (P, 1, sub, LANE)."""
    # The walk is a non-differentiable lookup (pallas_call has no JVP rule;
    # the diff layer recomputes attributes from ids) — cut the tangent path
    # on the INPUTS (stop_gradient on outputs alone still traces JVP into
    # the kernel; see kernels/traverse.py).
    rays = jax.lax.stop_gradient(rays)
    wide = jax.lax.stop_gradient(wide)
    comps, p, n = _pad_tiles(rays, sub, *extra, walks=1)
    return rays, wide, comps, p, n


def _leaf_rows(rows, row_s, c, r, row0, tri_in_hbm, max_rows):
    """The (128,) f32 triangle row for slot r of leaf child c."""
    if tri_in_hbm:
        return row_s[c * max_rows + r, :]
    return rows[row0 + r, :]


# ---------------------------------------------------------------------------
# Closest hit
# ---------------------------------------------------------------------------
def _closest8_kernel(wrow, rows, ox, oy, oz, dx, dy, dz,
                     t_o, u_o, v_o, id_o, *scratch,
                     t_min: float, sub: int, tri_in_hbm: bool,
                     interpret: bool, stack_walk: bool,
                     max_rows: int = R_MAX_ROWS,
                     count_visits: bool = False, ordered: bool = False,
                     shade_out: bool = False):
    if count_visits:
        vis_o, scratch = scratch[0], scratch[1:]
        vis_o[0, 0] = jnp.zeros((sub, LANE), jnp.int32)
    else:
        vis_o = None
    if shade_out:
        # 9 shading outputs: albedo, emission, geometric normal (unnormal-
        # ized e1 x e2) of the winning triangle — selected alongside the
        # (t, u, v, id) accumulators so the hard render needs NO per-ray
        # table-row gather afterwards (docs/PERF.md round 5).
        sh_o, scratch = list(scratch[:9]), scratch[9:]
        for ref in sh_o:
            ref[0, 0] = jnp.zeros((sub, LANE), jnp.float32)
    else:
        sh_o = None
    if stack_walk:
        stk, dma = scratch[0], scratch[1:]
    else:
        stk, dma = None, scratch
    oxv, oyv, ozv = ox[0, 0], oy[0, 0], oz[0, 0]
    dxv, dyv, dzv = dx[0, 0], dy[0, 0], dz[0, 0]
    ix, iy, iz = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)
    oix, oiy, oiz = oxv * ix, oyv * iy, ozv * iz  # slab FMA precompute
    # Representative ray direction for near-first push ordering: the first
    # ray of the packet (packets are morton/light-major coherent; a scalar
    # extract is free where a tile mean-reduce costs ~200 cycles/packet).
    kdx, kdy, kdz = dxv[0, 0], dyv[0, 0], dzv[0, 0]
    t_o[0, 0] = jnp.full((sub, LANE), T_MAX, jnp.float32)
    u_o[0, 0] = jnp.zeros((sub, LANE), jnp.float32)
    v_o[0, 0] = jnp.zeros((sub, LANE), jnp.float32)
    id_o[0, 0] = jnp.full((sub, LANE), -1, jnp.int32)
    row_s, sem = dma if tri_in_hbm else (None, None)

    def visit(cur, sp):
        rd, rdi = _node_row(wrow, cur)
        metas = [decode_lane_i32(rdi(48 + c)) for c in range(ENTRIES)]
        esc, has_i = decode_lane_i32(rdi(62)), decode_lane_i32(rdi(63))
        if count_visits:
            # low 16 bits: wide-node visits; high bits: leaf ROWS intersected
            # (each row = 8 Moller-Trumbore tests over the whole tile).
            vis_o[0, 0] = vis_o[0, 0] + 1
        if tri_in_hbm:
            _start_leaf_dmas(metas, rows, row_s, sem, max_rows)
        bits = _visit_mask(rd, oix, oiy, oiz, ix, iy, iz, t_min, t_o[0, 0],
                           interpret, stack_walk)
        for c in range(ENTRIES):
            m = metas[c]
            hit_c = ((bits >> (c + 1)) & 1) > 0
            n_rows = ((~m) & 7) + 1
            # Clamp BEFORE the predicated leaf body: Mosaic issues dynamic
            # VMEM loads even when their pl.when predicate is false
            # (measured on v5e), and for internal children ~m >> 3 is
            # negative.  Clamped dead loads read pad rows — harmless.
            row0 = jnp.maximum((~m) >> 3, 0)
            if tri_in_hbm:
                # balance EVERY started copy (starts are mask-independent)
                @pl.when(m < 0)
                def _(c=c, row0=row0):
                    _leaf_dma(rows, row_s, sem, c, row0, max_rows).wait()
            for r in range(max_rows):
                @pl.when(hit_c & (m < 0) & (r < n_rows))
                def _(c=c, r=r, row0=row0):
                    if count_visits:
                        vis_o[0, 0] = vis_o[0, 0] + (1 << 16)
                    trow = _leaf_rows(rows, row_s, c, r, row0, tri_in_hbm, max_rows)
                    trowi = jax.lax.bitcast_convert_type(trow, jnp.int32)
                    t_b, u_b = t_o[0, 0], u_o[0, 0]
                    v_b, id_b = v_o[0, 0], id_o[0, 0]
                    if shade_out:
                        sh_b = [ref[0, 0] for ref in sh_o]
                    for j in range(8):
                        t, u, v, det = _mt_scalar_tri(
                            oxv, oyv, ozv, dxv, dyv, dzv, trow, 9 * j
                        )
                        tid = decode_lane_i32(trowi[72 + j])
                        better = (t < t_b) | (
                            (t == t_b) & (tid < id_b) & (id_b >= 0)
                        )
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
                        if shade_out:
                            e1x, e1y, e1z = (trow[9 * j + 3], trow[9 * j + 4],
                                             trow[9 * j + 5])
                            e2x, e2y, e2z = (trow[9 * j + 6], trow[9 * j + 7],
                                             trow[9 * j + 8])
                            vals = (
                                trow[80 + 3 * j], trow[81 + 3 * j],
                                trow[82 + 3 * j],
                                trow[104 + 3 * j], trow[105 + 3 * j],
                                trow[106 + 3 * j],
                                e1y * e2z - e1z * e2y,
                                e1z * e2x - e1x * e2z,
                                e1x * e2y - e1y * e2x,
                            )
                            sh_b = [jnp.where(ok, vv, bb)
                                    for vv, bb in zip(vals, sh_b)]
                    t_o[0, 0] = t_b
                    u_o[0, 0] = u_b
                    v_o[0, 0] = v_b
                    id_o[0, 0] = id_b
                    if shade_out:
                        for ref, bb in zip(sh_o, sh_b):
                            ref[0, 0] = bb
            if stack_walk and not ordered:
                push = (((bits >> (c + 1)) & 1) > 0) & (m >= 0)
                sp = _stack_push(stk, sp, m, push)
        if stack_walk and ordered:
            keys = [
                (rd(6 * c) + rd(6 * c + 3)) * kdx
                + (rd(6 * c + 1) + rd(6 * c + 4)) * kdy
                + (rd(6 * c + 2) + rd(6 * c + 5)) * kdz
                for c in range(ENTRIES)
            ]
            pushes = [
                (((bits >> (c + 1)) & 1) > 0) & (metas[c] >= 0)
                for c in range(ENTRIES)
            ]
            sp = _ordered_pushes(stk, sp, keys, metas, pushes)
        return bits, esc, has_i, sp

    _run_walk(visit, stack_walk, stk)


def traverse_pallas8(
    rays: Rays,
    tris: Triangles,
    wide: WideBVH,
    t_min: float = DEFAULT_T_MIN,
    sub: int | None = None,
    walk: str = DEFAULT_WALK,
    count_visits: bool = False,
    ordered: bool = False,
    shade_out: bool = False,
) -> Hit:
    """Closest hit via the BVH8 walk (VMEM- or HBM-triangle tier).

    walk='escape': stackless escape threading (visits failing internal
    children once each).  walk='stack': VMEM row stack — skips failing
    subtrees entirely at the cost of a push/pop pair per internal child.
    count_visits=True additionally returns a (P,) int32 per-packet counter
    (low 16 bits: wide-node visits, high bits: leaf rows intersected) — the
    tree-quality metric driving the collapse/ordering work (VERDICT r4
    next #1a); the counter adds one (sub, 128) i32 add per visit.
    shade_out=True additionally returns (albedo (N,3), emission (N,3),
    normal (N,3) unnormalized geometric) of each winning triangle, selected
    in-kernel from the shading lanes of the leaf rows — the hard render
    then needs no per-ray table gather (the ~17 ms/frame stage at 1M tris,
    docs/PERF.md round 5)."""
    plan = plan8(wide)
    if plan is None:
        raise RuntimeError(
            f"traverse_pallas8: wide rows ({wide_bytes(wide)} B) exceed the "
            f"VMEM budget ({VMEM_BUDGET8_BYTES}); use the packet engine"
        )
    (tri_in_hbm,) = plan
    _check_stack(wide, walk)
    sub = _auto_sub(wide) if sub is None else sub
    rays, wide, comps, p, n = _prep(rays, wide, sub)
    ox, oy, oz, dx, dy, dz = comps
    tile = jax.ShapeDtypeStruct((p, 1, sub, LANE), jnp.float32)
    itile = jax.ShapeDtypeStruct((p, 1, sub, LANE), jnp.int32)
    interp = _interpret()
    out = pl.pallas_call(
        functools.partial(_closest8_kernel, t_min=t_min, sub=sub,
                          tri_in_hbm=tri_in_hbm, interpret=interp,
                          stack_walk=walk == "stack", max_rows=wide.max_rows,
                          count_visits=count_visits, ordered=ordered,
                          shade_out=shade_out),
        grid=(p,),
        in_specs=_wide_specs(tri_in_hbm) + [_ray_spec(sub, 1)] * 6,
        out_specs=[_ray_spec(sub, 1)]
        * (4 + int(count_visits) + 9 * int(shade_out)),
        out_shape=[tile, tile, tile, itile]
        + ([itile] if count_visits else [])
        + [tile] * (9 if shade_out else 0),
        scratch_shapes=_walk_scratch(walk == "stack", tri_in_hbm,
                                     wide.max_rows),
        compiler_params=_compiler_params(
            wide, tri_in_hbm,
            io_tiles=10 + int(count_visits) + 9 * int(shade_out), sub=sub),
        interpret=interp,
    )(wide.wrow, wide.tri_rows, ox, oy, oz, dx, dy, dz)
    t, u, v, tid = out[:4]
    shape = rays.shape
    hit = Hit(
        t=t.reshape(-1)[:n].reshape(shape),
        u=u.reshape(-1)[:n].reshape(shape),
        v=v.reshape(-1)[:n].reshape(shape),
        tri=tid.reshape(-1)[:n].reshape(shape),
    )
    extras = []
    k = 4
    if count_visits:
        extras.append(out[k][:, 0, 0, 0])  # every lane holds the counter
        k += 1
    if shade_out:
        def vec3(i):
            return jnp.stack(
                [out[k + i + c].reshape(-1)[:n] for c in range(3)], axis=-1
            ).reshape(*shape, 3)

        extras.append((vec3(0), vec3(3), vec3(6)))  # albedo, emission, nrm
    if extras:
        return (hit, *extras)
    return hit


# ---------------------------------------------------------------------------
# Any hit (hard shadows)
# ---------------------------------------------------------------------------
def _occluded8_kernel(wrow, rows, ox, oy, oz, dx, dy, dz, tm, blk_o,
                      *scratch, t_min: float, sub: int, tri_in_hbm: bool,
                      interpret: bool, stack_walk: bool,
                      max_rows: int = R_MAX_ROWS):
    if stack_walk:
        stk, dma = scratch[0], scratch[1:]
    else:
        stk, dma = None, scratch
    oxv, oyv, ozv = ox[0, 0], oy[0, 0], oz[0, 0]
    dxv, dyv, dzv = dx[0, 0], dy[0, 0], dz[0, 0]
    ix, iy, iz = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)
    oix, oiy, oiz = oxv * ix, oyv * iy, ozv * iz  # slab FMA precompute
    tmax = tm[0, 0]
    blk_o[0, 0] = jnp.zeros((sub, LANE), jnp.int32)
    row_s, sem = dma if tri_in_hbm else (None, None)

    # Rays whose window (t_min, tmax) is empty can never block: misses get
    # t_max = 0 upstream (pipeline) so they start dead and a fully-dead
    # packet drains its stack on the first visit.
    alive0 = tmax > t_min

    def visit(cur, sp):
        rd, rdi = _node_row(wrow, cur)
        metas = [decode_lane_i32(rdi(48 + c)) for c in range(ENTRIES)]
        esc, has_i = decode_lane_i32(rdi(62)), decode_lane_i32(rdi(63))
        # Blocked rays get upper < t_min so every slab test fails for them;
        # bit 0 = any ray still live -> stack drained when it clears.
        live = alive0 & (blk_o[0, 0] == 0)
        upper = jnp.where(live, tmax, t_min - 1.0)
        if tri_in_hbm:
            _start_leaf_dmas(metas, rows, row_s, sem, max_rows)
        bits = _visit_mask(rd, oix, oiy, oiz, ix, iy, iz, t_min, upper,
                           interpret, stack_walk,
                           live=live if stack_walk else None)
        for c in range(ENTRIES):
            m = metas[c]
            hit_c = ((bits >> (c + 1)) & 1) > 0
            n_rows = ((~m) & 7) + 1
            row0 = jnp.maximum((~m) >> 3, 0)  # clamp: see closest kernel
            if tri_in_hbm:
                # balance EVERY started copy (starts are mask-independent)
                @pl.when(m < 0)
                def _(c=c, row0=row0):
                    _leaf_dma(rows, row_s, sem, c, row0, max_rows).wait()
            for r in range(max_rows):
                @pl.when(hit_c & (m < 0) & (r < n_rows))
                def _(c=c, r=r, row0=row0):
                    trow = _leaf_rows(rows, row_s, c, r, row0, tri_in_hbm, max_rows)
                    trowi = jax.lax.bitcast_convert_type(trow, jnp.int32)
                    blocked = blk_o[0, 0] > 0
                    for j in range(8):
                        t, u, v, det = _mt_scalar_tri(
                            oxv, oyv, ozv, dxv, dyv, dzv, trow, 9 * j
                        )
                        ok = (
                            (jnp.abs(det) > DET_EPS)
                            & (u >= 0.0)
                            & (v >= 0.0)
                            & (u + v <= 1.0)
                            & (t > t_min)
                            & (t < tmax)
                            & (decode_lane_i32(trowi[72 + j]) >= 0)
                        )
                        blocked = blocked | ok
                    blk_o[0, 0] = blocked.astype(jnp.int32)
            if stack_walk:
                push = (((bits >> (c + 1)) & 1) > 0) & (m >= 0)
                sp = _stack_push(stk, sp, m, push)
        if stack_walk:
            # all-blocked drain: no live ray left -> empty the stack now
            # instead of popping (and box-testing) every queued subtree
            sp = jnp.where((bits & 1) > 0, sp, jnp.int32(0))
        return bits, esc, has_i, sp

    _run_walk(visit, stack_walk, stk)


def occluded_pallas8(
    rays: Rays,
    tris: Triangles,
    wide: WideBVH,
    t_max,
    t_min: float = DEFAULT_T_MIN,
    sub: int | None = None,
    walk: str = DEFAULT_WALK,
) -> Array:
    plan = plan8(wide)
    if plan is None:
        raise RuntimeError(
            f"occluded_pallas8: wide rows ({wide_bytes(wide)} B) exceed the "
            f"VMEM budget ({VMEM_BUDGET8_BYTES}); use the packet engine"
        )
    (tri_in_hbm,) = plan
    _check_stack(wide, walk)
    sub = _auto_sub(wide) if sub is None else sub
    shape = rays.shape
    tmax_flat = jax.lax.stop_gradient(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    ).reshape(-1)
    rays, wide, comps, p, n = _prep(rays, wide, sub, tmax_flat)
    ox, oy, oz, dx, dy, dz, tm = comps
    interp = _interpret()
    blk = pl.pallas_call(
        functools.partial(_occluded8_kernel, t_min=t_min, sub=sub,
                          tri_in_hbm=tri_in_hbm, interpret=interp,
                          stack_walk=walk == "stack", max_rows=wide.max_rows),
        grid=(p,),
        in_specs=_wide_specs(tri_in_hbm) + [_ray_spec(sub, 1)] * 7,
        out_specs=_ray_spec(sub, 1),
        out_shape=jax.ShapeDtypeStruct((p, 1, sub, LANE), jnp.int32),
        scratch_shapes=_walk_scratch(walk == "stack", tri_in_hbm,
                                     wide.max_rows),
        compiler_params=_compiler_params(wide, tri_in_hbm, io_tiles=8,
                                         sub=sub),
        interpret=interp,
    )(wide.wrow, wide.tri_rows, ox, oy, oz, dx, dy, dz, tm)
    return (blk.reshape(-1)[:n] > 0).reshape(shape)


# ---------------------------------------------------------------------------
# K nearest extended hits (soft/differentiable path)
# ---------------------------------------------------------------------------
def _knear8_kernel(wrow, rows, ox, oy, oz, dx, dy, dz, tm, ids_o, ts_s,
                   *scratch, t_min: float, k: int, band: float, sub: int,
                   tri_in_hbm: bool, interpret: bool, stack_walk: bool,
                   max_rows: int = R_MAX_ROWS):
    if stack_walk:
        stk, dma = scratch[0], scratch[1:]
    else:
        stk, dma = None, scratch
    big_id = jnp.int32(2**31 - 1)
    oxv, oyv, ozv = ox[0, 0], oy[0, 0], oz[0, 0]
    dxv, dyv, dzv = dx[0, 0], dy[0, 0], dz[0, 0]
    ix, iy, iz = _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)
    oix, oiy, oiz = oxv * ix, oyv * iy, ozv * iz  # slab FMA precompute
    tmax = tm[0, 0]
    for i in range(k):
        ts_s[i] = jnp.full((sub, LANE), T_MAX, jnp.float32)
        ids_o[0, 0, i] = jnp.full((sub, LANE), big_id, jnp.int32)
    row_s, sem = dma if tri_in_hbm else (None, None)

    def insert(ts, ids, t, tid, ok):
        """Bubble (t, tid) into the sorted k-lists, lexicographic on (t, id)
        — identical ordering to accel/packet.  Dedup by id first: boundary
        rows shared by adjacent fat leaves test the same triangle twice."""
        dup = (ids[0] == tid)
        for i in range(1, k):
            dup = dup | (ids[i] == tid)
        tc = jnp.where(ok & ~dup, t, T_MAX)
        ic = jnp.where(ok & ~dup, tid, big_id)
        for i in range(k):
            less = (tc < ts[i]) | ((tc == ts[i]) & (ic < ids[i]))
            ts[i], tc = jnp.where(less, tc, ts[i]), jnp.where(less, ts[i], tc)
            ids[i], ic = (
                jnp.where(less, ic, ids[i]),
                jnp.where(less, ids[i], ic),
            )
        return ts, ids

    def visit(cur, sp):
        rd, rdi = _node_row(wrow, cur)
        metas = [decode_lane_i32(rdi(48 + c)) for c in range(ENTRIES)]
        esc, has_i = decode_lane_i32(rdi(62)), decode_lane_i32(rdi(63))
        upper = jnp.minimum(ts_s[k - 1], tmax)
        if tri_in_hbm:
            _start_leaf_dmas(metas, rows, row_s, sem, max_rows)
        bits = _visit_mask(rd, oix, oiy, oiz, ix, iy, iz, t_min, upper,
                           interpret, stack_walk)
        for c in range(ENTRIES):
            m = metas[c]
            hit_c = ((bits >> (c + 1)) & 1) > 0
            n_rows = ((~m) & 7) + 1
            row0 = jnp.maximum((~m) >> 3, 0)  # clamp: see closest kernel
            if tri_in_hbm:
                # balance EVERY started copy (starts are mask-independent)
                @pl.when(m < 0)
                def _(c=c, row0=row0):
                    _leaf_dma(rows, row_s, sem, c, row0, max_rows).wait()
            for r in range(max_rows):
                @pl.when(hit_c & (m < 0) & (r < n_rows))
                def _(c=c, r=r, row0=row0):
                    trow = _leaf_rows(rows, row_s, c, r, row0, tri_in_hbm, max_rows)
                    trowi = jax.lax.bitcast_convert_type(trow, jnp.int32)
                    ts = [ts_s[i] for i in range(k)]
                    ids = [ids_o[0, 0, i] for i in range(k)]
                    for j in range(8):
                        t, u, v, det = _mt_scalar_tri(
                            oxv, oyv, ozv, dxv, dyv, dzv, trow, 9 * j
                        )
                        tid = decode_lane_i32(trowi[72 + j])
                        ok = (
                            (jnp.abs(det) > DET_EPS)
                            & (u >= -band)
                            & (v >= -band)
                            & (u + v <= 1.0 + band)
                            & (t > t_min)
                            & (t < tmax)
                            & (tid >= 0)
                        )
                        ts, ids = insert(ts, ids, t, tid, ok)
                    for i in range(k):
                        ts_s[i] = ts[i]
                        ids_o[0, 0, i] = ids[i]
            if stack_walk:
                push = (((bits >> (c + 1)) & 1) > 0) & (m >= 0)
                sp = _stack_push(stk, sp, m, push)
        return bits, esc, has_i, sp

    _run_walk(visit, stack_walk, stk)
    for i in range(k):
        # unfilled slots carry the big-id sentinel -> emit -1 like the oracle
        ids_o[0, 0, i] = jnp.where(ids_o[0, 0, i] == big_id, -1,
                                   ids_o[0, 0, i])


def k_nearest_ids_pallas8(
    rays: Rays,
    tris: Triangles,
    wide: WideBVH,
    k: int,
    band: float,
    t_min: float = DEFAULT_T_MIN,
    t_max=T_MAX,
    sub: int | None = None,
    walk: str = DEFAULT_WALK,
) -> Array:
    """Nearest-k extended-hit tri ids per ray, (N, k) int32 (-1 = none)."""
    plan = plan8(wide)
    if plan is None:
        raise RuntimeError(
            f"k_nearest_ids_pallas8: wide rows ({wide_bytes(wide)} B) exceed "
            f"the VMEM budget ({VMEM_BUDGET8_BYTES}); use the packet engine"
        )
    (tri_in_hbm,) = plan
    _check_stack(wide, walk)
    # k-nearest keeps (k, sub, LANE) scratch + out blocks live: sub=64 blows
    # VMEM pipelining and runs 3-5x SLOWER than sub=32 at every k measured
    # (k=4: 20.9 vs 65.7 ms; k=16: 49.6 vs 252.9 ms at 1M tris, 256K rays)
    # — so the auto choice here is always 32, not _auto_sub.
    sub = 32 if sub is None else sub
    shape = rays.shape
    tmax_flat = jax.lax.stop_gradient(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    ).reshape(-1)
    rays, wide, comps, p, n = _prep(rays, wide, sub, tmax_flat)
    ox, oy, oz, dx, dy, dz, tm = comps
    interp = _interpret()
    ids = pl.pallas_call(
        functools.partial(_knear8_kernel, t_min=t_min, k=k, band=band,
                          sub=sub, tri_in_hbm=tri_in_hbm, interpret=interp,
                          stack_walk=walk == "stack", max_rows=wide.max_rows),
        grid=(p,),
        in_specs=_wide_specs(tri_in_hbm) + [_ray_spec(sub, 1)] * 7,
        out_specs=pl.BlockSpec(
            (1, 1, k, sub, LANE), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((p, 1, k, sub, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((k, sub, LANE), jnp.float32)]
        + _walk_scratch(walk == "stack", tri_in_hbm, wide.max_rows),
        compiler_params=_compiler_params(wide, tri_in_hbm, io_tiles=7 + 2 * k,
                                         sub=sub),
        interpret=interp,
    )(wide.wrow, wide.tri_rows, ox, oy, oz, dx, dy, dz, tm)
    # (p, 1, k, sub, 128) -> (p*sub*128, k)
    ids = jnp.moveaxis(ids, 2, 4).reshape(-1, k)
    return ids[:n]
