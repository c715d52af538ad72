"""Pallas TPU traversal kernels (SURVEY.md §2b #10).

One fused Mosaic kernel walks the whole BVH per ray *packet*: the packet's
(sub, 128) ray tile lives in vector registers / VMEM for the entire walk, the
packed node arrays are pinned in VMEM, and scalar node cursors drive a
`lax.while_loop` — the complete traversal is ONE kernel launch per render
instead of one XLA op dispatch per node step.

Mosaic legality (VERDICT r1 weak #2): hit state lives in output/scratch refs
and leaf intersection is a side-effecting `@pl.when` region — Mosaic
legalizes predicated regions without results, NOT the value-returning
`lax.cond` round 1 shipped (failed `scf.if` legalization on real TPUs).

Latency hiding (`walks`): each kernel instance interleaves several
independent packet walks; every while-loop iteration advances all still-live
walks one node.  A single walk's per-node chain (scalar node loads -> VPU
slab -> cross-lane any() -> scalar branch; ~1.2 us measured at walks=1 on a
v5e) is serial, but different walks' chains are independent, so Mosaic can
overlap them instead of paying the full chain per node visit.

Node layout (measured on v5e: VMEM holds ~15 MB of LANE-perfect (R, 128)
arrays, but an (M, 8) array occupies ~2x its logical bytes): nodes are
repacked lane-perfect at trace time — 16 nodes x 8 f32 AABB+pad
scalars per 128-lane row, and 64 nodes x 2 i32 records (escape link,
leaf_row with -1 = internal) per row.  A 1M-tri BVH (~444K nodes) is
10.7 MB in bf16 — inside the budget, where the round-2 (M, 8) layout
overflowed even quantized and silently fell back to the XLA packet engine.

Scale: this engine runs VMEM-RESIDENT scenes only (nodes + triangle rows);
beyond that `_plan` returns None and callers fall back (logged, never
silent) — large scenes are the BVH8 engine's job (kernels/traverse8.py).
Two tiers were retired after failing Mosaic compilation on real hardware,
which interpret-mode oracles cannot detect: the bf16 node tier (BENCH_r02)
and the HBM-triangle DMA tier (round-3 on-chip parity sweep).  The DMA
machinery below remains only as interpret-tested reference code.

Semantics: identical accept tests and (t, tri-id) tie-break as accel/packet
(the oracle, bitwise in interpret mode; on real TPUs Mosaic's FMA contraction
flips O(1e-4) of boundary rays vs the XLA engines, measured 11/65536).

The reference repo has no kernels of any kind to mirror (SURVEY.md §0); this
is the TPU-native equivalent of the GPU compute-shader traversal a project
with the reference's README would contain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpurt.accel.intersect import DEFAULT_T_MIN, DET_EPS
from tpurt.accel.packet import LEAF_CAP, PackedBVH
from tpurt.core.geometry import Hit, Rays, T_MAX, Triangles

Array = jax.Array

LANE = 128
DEFAULT_SUB = 32   # (sub, 128) ray tile per packet walk
# Interleaved independent packet walks per kernel instance.  Measured on v5e
# (bunny 70K, 256K rays): walks=1 48.5 ms, walks=4 51.7 ms, walks=8 54.7 ms —
# Mosaic does not overlap the walks' serial chains and each instance runs
# until its SLOWEST walk, so interleaving loses; kept as a tuning knob.
DEFAULT_WALKS = 1

NODES_PER_F32_ROW = 16  # 16 nodes x 8 scalars = 128 lanes
NODES_PER_I32_ROW = 64  # 64 nodes x 2 ints    = 128 lanes

# Leave headroom under the ~15 MB of usable VMEM for ray tiles + leaf scratch.
VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def node_bytes(packed: PackedBVH) -> int:
    """Bytes of the LANE-perfect kernel node layout (actual ~= logical)."""
    m = packed.num_nodes
    rows_f = -(-m // NODES_PER_F32_ROW)
    rows_i = -(-m // NODES_PER_I32_ROW)
    return rows_f * LANE * 4 + rows_i * LANE * 4


def tri_bytes(packed: PackedBVH) -> int:
    return (packed.tri_rows.size * packed.tri_rows.dtype.itemsize
            + packed.tri_ids.size * packed.tri_ids.dtype.itemsize)


def packed_bytes(packed: PackedBVH) -> int:
    return node_bytes(packed) + tri_bytes(packed)


def fits_vmem(packed: PackedBVH) -> bool:
    """Whole packed BVH (nodes + tris) VMEM-resident?"""
    return packed_bytes(packed) <= VMEM_BUDGET_BYTES


def nodes_fit_vmem(packed: PackedBVH) -> bool:
    """Nodes VMEM-resident with triangle rows streamed from HBM?"""
    return node_bytes(packed) <= VMEM_BUDGET_BYTES


def _lane_pack_nodes(packed: PackedBVH):
    """Repack (M, 8) node_f32 + (M, 4) node_i32 into LANE-perfect rows.

    nf2: (ceil(M/16), 128) — node i's AABB scalar c at [i//16, (i%16)*8+c].
    ni2: (ceil(M/64), 128) i32 — node i's (escape, leaf_row|-1) at
         [i//64, (i%64)*2 + {0,1}]; leaf_row < 0 marks an internal node.
    Pure reshapes/pads at trace time (~ms at 1M tris), recomputed per call —
    XLA CSEs it across the kernels of one render.
    """
    f, n = packed.node_f32, packed.node_i32
    m = f.shape[0]
    pad_f = (-m) % NODES_PER_F32_ROW
    nf2 = jnp.pad(f, ((0, pad_f), (0, 0))).reshape(-1, LANE)
    esc = n[:, 0]
    leaf = jnp.where(n[:, 3] > 0, n[:, 1], -1)
    rec = jnp.stack([esc, leaf], axis=1)  # (M, 2)
    pad_i = (-m) % NODES_PER_I32_ROW
    ni2 = jnp.pad(rec, ((0, pad_i), (0, 0)),
                  constant_values=-1).reshape(-1, LANE)
    return nf2, ni2


def _log_fallback(fn_name: str, packed: PackedBVH) -> None:
    """Announce the packet-engine fallback instead of silently substituting
    engines (VERDICT r1 weak #9)."""
    import logging

    logging.getLogger("tpurt").warning(
        "%s: packed BVH nodes (%d bytes) exceed the VMEM budget (%d) "
        "even HBM-tiered; falling back to the XLA packet engine",
        fn_name, node_bytes(packed), VMEM_BUDGET_BYTES,
    )


def _pad_tiles(rays: Rays, sub: int, *extra_flat: Array, walks: int = 1):
    """Flatten rays (+ optional per-ray scalars) and pad to walks*sub*LANE,
    reshaped to (P, walks, sub, LANE) component tiles."""
    o = rays.o.reshape(-1, 3)
    d = rays.d.reshape(-1, 3)
    n = o.shape[0]
    per = walks * sub * LANE
    pad = (-n) % per
    if pad:
        # Pad rays must be DEAD in the kernels: origin far outside any scene
        # box makes every slab test fail ((lo - 1e30) * _safe_inv(0) = -inf
        # on both slabs -> t_far = -inf < t_min), so padding packets
        # terminate immediately instead of walking the whole tree
        # (VERDICT r2 weak #9).
        o = jnp.concatenate([o, jnp.full((pad, 3), 1e30, o.dtype)])
        d = jnp.concatenate([d, jnp.zeros((pad, 3), d.dtype)])
        extra_flat = tuple(
            jnp.concatenate([e, jnp.zeros((pad,), e.dtype)]) for e in extra_flat
        )
    p = o.shape[0] // per

    def tile(x):
        return x.reshape(p, walks, sub, LANE)

    comps = tuple(tile(o[:, c]) for c in range(3)) + tuple(
        tile(d[:, c]) for c in range(3)
    )
    return comps + tuple(tile(e) for e in extra_flat), p, n


def _safe_inv(d):
    return jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, jnp.sign(d) * 1e30 + 1e30)


def _onehot_extract(row, base, count, zero):
    """`count` consecutive scalars starting at dynamic lane `base` of a
    128-lane vector `row`, via one-hot masked reductions.  Mosaic cannot
    compile scalar VMEM loads with a DYNAMIC lane index, and `pltpu.roll` by
    a dynamic shift also crashes it (both measured on v5e: remote-compile
    HTTP 500); a dynamic-ROW vector load + `iota == base+c` masked sums is
    the legal form — exact, since exactly one lane survives each mask."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (LANE,), 0)
    return tuple(
        jnp.sum(jnp.where(iota == base + c, row, zero)) for c in range(count)
    )


def _node_rec(ni_ref, node):
    """(escape, leaf_row, is_leaf) of one node from the lane-packed ints."""
    row = ni_ref[node // NODES_PER_I32_ROW, :]
    base = (node % NODES_PER_I32_ROW) * 2
    esc, leaf_row = _onehot_extract(row, base, 2, jnp.int32(0))
    return esc, leaf_row, leaf_row >= 0


def _node_box(nf_ref, node):
    """The six AABB scalars of one node."""
    row = nf_ref[node // NODES_PER_F32_ROW, :]
    base = (node % NODES_PER_F32_ROW) * 8
    return _onehot_extract(row, base, 6, jnp.float32(0.0))


def _slab(ox, oy, oz, ix, iy, iz, nf_ref, node, t_min, t_upper):
    """Packet slab test against node AABB; scalars broadcast over the tile."""
    lox, loy, loz, hix, hiy, hiz = _node_box(nf_ref, node)
    tx0, tx1 = (lox - ox) * ix, (hix - ox) * ix
    ty0, ty1 = (loy - oy) * iy, (hiy - oy) * iy
    tz0, tz1 = (loz - oz) * iz, (hiz - oz) * iz
    t_near = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.maximum(jnp.minimum(tz0, tz1), t_min),
    )
    t_far = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.minimum(jnp.maximum(tz0, tz1), t_upper),
    )
    return t_near <= t_far


def _mt_scalar_tri(ox, oy, oz, dx, dy, dz, row, base):
    """Möller–Trumbore of the ray tile vs ONE triangle whose (v0, e1, e2)
    scalars sit at row[base:base+9]. Same op order as accel/packet._mt_packet
    (sum-of-mul reductions, smooth pseudo-inverse)."""
    v0x, v0y, v0z = row[base + 0], row[base + 1], row[base + 2]
    e1x, e1y, e1z = row[base + 3], row[base + 4], row[base + 5]
    e2x, e2y, e2z = row[base + 6], row[base + 7], row[base + 8]
    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = det / (det * det + DET_EPS)
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
    # qvec = tvec x e1
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    return t, u, v, det


def _make_leaf_reader(rows, tids, row_s, ids_s, sem, tri_in_hbm: bool,
                      slot: int = 0):
    """Leaf-row access strategy: direct VMEM reads for resident scenes, or a
    synchronous (1, 128)+(1, LEAF_CAP) DMA into scratch for HBM-tiered ones.
    `slot` gives each interleaved walk its own scratch row + semaphores so
    concurrent leaf visits of different walks don't race."""
    if not tri_in_hbm:
        def fetch(leaf_row):
            return rows[leaf_row, :], lambda j: tids[leaf_row, j]

        return fetch

    def fetch(leaf_row):
        cp1 = pltpu.make_async_copy(
            rows.at[pl.ds(leaf_row, 1), :],
            row_s.at[pl.ds(slot, 1), :], sem.at[2 * slot]
        )
        cp2 = pltpu.make_async_copy(
            tids.at[pl.ds(leaf_row, 1), :],
            ids_s.at[pl.ds(slot, 1), :], sem.at[2 * slot + 1]
        )
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        return row_s[slot, :], lambda j: ids_s[slot, j]

    return fetch


def _tri_specs(tri_in_hbm: bool):
    space = pl.ANY if tri_in_hbm else pltpu.VMEM
    return [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # nf2 lane-packed f32
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ni2 lane-packed i32
        pl.BlockSpec(memory_space=space),       # tri_rows (L, 128)
        pl.BlockSpec(memory_space=space),       # tri_ids  (L, LEAF_CAP)
    ]


def _leaf_scratch(tri_in_hbm: bool, walks: int):
    if not tri_in_hbm:
        return []
    return [
        pltpu.VMEM((walks, 128), jnp.float32),
        pltpu.VMEM((walks, LEAF_CAP), jnp.int32),
        pltpu.SemaphoreType.DMA((2 * walks,)),
    ]


def _ray_spec(sub: int, walks: int):
    return pl.BlockSpec((1, walks, sub, LANE), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _plan(packed: PackedBVH):
    """(nf2, ni2, packed, tri_in_hbm) or None when the packed BVH exceeds
    VMEM.  Two tiers were deliberately RETIRED after failing Mosaic
    compilation on real hardware (the interpret-mode oracles cannot see
    Mosaic legality): the bf16 node tier (BENCH_r02: dynamic bf16 row
    loads are illegal) and the HBM-triangle DMA tier (round-3 on-chip
    parity sweep: tpu_compile_helper crash).  Scenes beyond VMEM run on
    the BVH8 engine (kernels/traverse8.py), whose f32 layout holds 1M-tri
    scenes resident and whose HBM tier compiles and matches on-chip; this
    engine stays as the VMEM-resident mid-size/oracle path."""
    if fits_vmem(packed):
        nf2, ni2 = _lane_pack_nodes(packed)
        return nf2, ni2, packed, False
    return None


def _interleaved_walk(ni, walks, body_for_walk):
    """Drive `walks` independent node cursors to termination; body_for_walk
    (g, node_idx, esc, leaf_row, is_leaf, live) -> next cursor value."""

    def cond(nodes):
        live = nodes[0] >= 0
        for g in range(1, walks):
            live = live | (nodes[g] >= 0)
        return live

    def body(nodes):
        out = []
        for g in range(walks):
            node = nodes[g]
            live = node >= 0
            nidx = jnp.maximum(node, 0)
            esc, leaf_row, is_leaf = _node_rec(ni, nidx)
            nxt = body_for_walk(g, nidx, esc, leaf_row, is_leaf, live)
            out.append(jnp.where(live, nxt, node))
        return tuple(out)

    jax.lax.while_loop(cond, body, tuple(jnp.int32(0) for _ in range(walks)))


# ---------------------------------------------------------------------------
# Closest hit
# ---------------------------------------------------------------------------
def _closest_kernel(nf, ni, rows, tids, ox, oy, oz, dx, dy, dz,
                    t_o, u_o, v_o, id_o, *scratch,
                    t_min: float, sub: int, walks: int, tri_in_hbm: bool):
    rays_g, fetch_g = [], []
    for g in range(walks):
        oxv, oyv, ozv = ox[0, g], oy[0, g], oz[0, g]
        dxv, dyv, dzv = dx[0, g], dy[0, g], dz[0, g]
        rays_g.append((oxv, oyv, ozv, dxv, dyv, dzv,
                       _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv)))
        fetch_g.append(_make_leaf_reader(
            rows, tids, *(scratch or (None, None, None)),
            tri_in_hbm=tri_in_hbm, slot=g))
        t_o[0, g] = jnp.full((sub, LANE), T_MAX, jnp.float32)
        u_o[0, g] = jnp.zeros((sub, LANE), jnp.float32)
        v_o[0, g] = jnp.zeros((sub, LANE), jnp.float32)
        id_o[0, g] = jnp.full((sub, LANE), -1, jnp.int32)

    def walk(g, nidx, esc, leaf_row, is_leaf, live):
        oxv, oyv, ozv, dxv, dyv, dzv, ix, iy, iz = rays_g[g]
        boxed = _slab(oxv, oyv, ozv, ix, iy, iz, nf, nidx, t_min, t_o[0, g])
        want = jnp.any(boxed) & live

        @pl.when(want & is_leaf)
        def _():
            t_b, u_b = t_o[0, g], u_o[0, g]
            v_b, id_b = v_o[0, g], id_o[0, g]
            row, tid_at = fetch_g[g](leaf_row)
            for j in range(LEAF_CAP):
                t, u, v, det = _mt_scalar_tri(oxv, oyv, ozv, dxv, dyv, dzv,
                                              row, 9 * j)
                tid = tid_at(j)
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
            t_o[0, g] = t_b
            u_o[0, g] = u_b
            v_o[0, g] = v_b
            id_o[0, g] = id_b

        return jnp.where(want & jnp.logical_not(is_leaf), nidx + 1, esc)

    _interleaved_walk(ni, walks, walk)


def traverse_pallas(
    rays: Rays,
    tris: Triangles,
    packed: PackedBVH,
    t_min: float = DEFAULT_T_MIN,
    sub: int = DEFAULT_SUB,
    walks: int = DEFAULT_WALKS,
) -> Hit:
    """Closest hit via the fused Pallas walk (VMEM- or HBM-tiered);
    packet-engine fallback only when nodes alone exceed VMEM."""
    plan = _plan(packed)
    if plan is None:
        _log_fallback("traverse_pallas", packed)
        from tpurt.accel.packet import traverse_packet

        return traverse_packet(rays, tris, packed, t_min)
    nf2, ni2, packed, tri_in_hbm = plan
    # The walk is a non-differentiable lookup (pallas_call has no JVP
    # rule; the diff layer recomputes attributes from ids) — cut the
    # tangent path on the INPUTS: stop_gradient on the output alone
    # still traces JVP into the kernel and crashes (found by /verify).
    rays = jax.lax.stop_gradient(rays)
    nf2, ni2 = jax.lax.stop_gradient((nf2, ni2))
    packed = jax.lax.stop_gradient(packed)
    (ox, oy, oz, dx, dy, dz), p, n = _pad_tiles(rays, sub, walks=walks)
    tile = jax.ShapeDtypeStruct((p, walks, sub, LANE), jnp.float32)
    itile = jax.ShapeDtypeStruct((p, walks, sub, LANE), jnp.int32)
    t, u, v, tid = pl.pallas_call(
        functools.partial(_closest_kernel, t_min=t_min, sub=sub, walks=walks,
                          tri_in_hbm=tri_in_hbm),
        grid=(p,),
        in_specs=_tri_specs(tri_in_hbm) + [_ray_spec(sub, walks)] * 6,
        out_specs=[_ray_spec(sub, walks)] * 4,
        out_shape=[tile, tile, tile, itile],
        scratch_shapes=_leaf_scratch(tri_in_hbm, walks),
        interpret=_interpret(),
    )(nf2, ni2, packed.tri_rows, packed.tri_ids, ox, oy, oz, dx, dy, dz)
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
def _occluded_kernel(nf, ni, rows, tids, ox, oy, oz, dx, dy, dz, tm, blk_o,
                     *scratch, t_min: float, sub: int, walks: int,
                     tri_in_hbm: bool):
    rays_g, fetch_g = [], []
    for g in range(walks):
        oxv, oyv, ozv = ox[0, g], oy[0, g], oz[0, g]
        dxv, dyv, dzv = dx[0, g], dy[0, g], dz[0, g]
        rays_g.append((oxv, oyv, ozv, dxv, dyv, dzv,
                       _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv),
                       tm[0, g]))
        fetch_g.append(_make_leaf_reader(
            rows, tids, *(scratch or (None, None, None)),
            tri_in_hbm=tri_in_hbm, slot=g))
        blk_o[0, g] = jnp.zeros((sub, LANE), jnp.int32)

    def walk(g, nidx, esc, leaf_row, is_leaf, live):
        oxv, oyv, ozv, dxv, dyv, dzv, ix, iy, iz, tmax = rays_g[g]
        blocked = blk_o[0, g] > 0
        boxed = _slab(oxv, oyv, ozv, ix, iy, iz, nf, nidx, t_min, tmax) \
            & jnp.logical_not(blocked)
        want = jnp.any(boxed) & live

        @pl.when(want & is_leaf)
        def _():
            blocked = blk_o[0, g] > 0
            row, tid_at = fetch_g[g](leaf_row)
            for j in range(LEAF_CAP):
                t, u, v, det = _mt_scalar_tri(oxv, oyv, ozv, dxv, dyv, dzv,
                                              row, 9 * j)
                ok = (
                    (jnp.abs(det) > DET_EPS)
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (u + v <= 1.0)
                    & (t > t_min)
                    & (t < tmax)
                    & (tid_at(j) >= 0)
                )
                blocked = blocked | ok
            blk_o[0, g] = blocked.astype(jnp.int32)

        # early-out per walk: all rays blocked -> terminate this walk
        done = jnp.all(blk_o[0, g] > 0)
        nxt = jnp.where(want & jnp.logical_not(is_leaf), nidx + 1, esc)
        return jnp.where(done, jnp.int32(-1), nxt)

    _interleaved_walk(ni, walks, walk)


def occluded_pallas(
    rays: Rays,
    tris: Triangles,
    packed: PackedBVH,
    t_max,
    t_min: float = DEFAULT_T_MIN,
    sub: int = DEFAULT_SUB,
    walks: int = DEFAULT_WALKS,
) -> Array:
    plan = _plan(packed)
    if plan is None:
        _log_fallback("occluded_pallas", packed)
        from tpurt.accel.packet import occluded_packet

        return occluded_packet(rays, tris, packed, t_max, t_min)
    nf2, ni2, packed, tri_in_hbm = plan
    # The walk is a non-differentiable lookup (pallas_call has no JVP
    # rule; the diff layer recomputes attributes from ids) — cut the
    # tangent path on the INPUTS: stop_gradient on the output alone
    # still traces JVP into the kernel and crashes (found by /verify).
    rays = jax.lax.stop_gradient(rays)
    nf2, ni2 = jax.lax.stop_gradient((nf2, ni2))
    packed = jax.lax.stop_gradient(packed)
    shape = rays.shape
    tmax_flat = jax.lax.stop_gradient(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    ).reshape(-1)
    (ox, oy, oz, dx, dy, dz, tm), p, n = _pad_tiles(rays, sub, tmax_flat,
                                                    walks=walks)
    blk = pl.pallas_call(
        functools.partial(_occluded_kernel, t_min=t_min, sub=sub, walks=walks,
                          tri_in_hbm=tri_in_hbm),
        grid=(p,),
        in_specs=_tri_specs(tri_in_hbm) + [_ray_spec(sub, walks)] * 7,
        out_specs=_ray_spec(sub, walks),
        out_shape=jax.ShapeDtypeStruct((p, walks, sub, LANE), jnp.int32),
        scratch_shapes=_leaf_scratch(tri_in_hbm, walks),
        interpret=_interpret(),
    )(nf2, ni2, packed.tri_rows, packed.tri_ids, ox, oy, oz, dx, dy, dz, tm)
    return (blk.reshape(-1)[:n] > 0).reshape(shape)


# ---------------------------------------------------------------------------
# K nearest extended hits (soft/differentiable path)
# ---------------------------------------------------------------------------
def _knear_kernel(nf, ni, rows, tids, ox, oy, oz, dx, dy, dz, tm, ids_o, ts_s,
                  *scratch, t_min: float, k: int, band: float, sub: int,
                  walks: int, tri_in_hbm: bool):
    """K-nearest walk: the sorted k-lists live in VMEM scratch (ts_s) and the
    output ref (ids_o, big-id sentinel during the walk)."""
    big_id = jnp.int32(2**31 - 1)
    rays_g, fetch_g = [], []
    for g in range(walks):
        oxv, oyv, ozv = ox[0, g], oy[0, g], oz[0, g]
        dxv, dyv, dzv = dx[0, g], dy[0, g], dz[0, g]
        rays_g.append((oxv, oyv, ozv, dxv, dyv, dzv,
                       _safe_inv(dxv), _safe_inv(dyv), _safe_inv(dzv),
                       tm[0, g]))
        fetch_g.append(_make_leaf_reader(
            rows, tids, *(scratch or (None, None, None)),
            tri_in_hbm=tri_in_hbm, slot=g))
        for i in range(k):
            ts_s[g, i] = jnp.full((sub, LANE), T_MAX, jnp.float32)
            ids_o[0, g, i] = jnp.full((sub, LANE), big_id, jnp.int32)

    def insert(ts, ids, t, tid, ok):
        """Bubble (t, tid) into the per-ray sorted k-lists, lexicographic on
        (t, id) — identical ordering to accel/packet's positional insert."""
        tc = jnp.where(ok, t, T_MAX)
        ic = jnp.where(ok, tid, big_id)  # (T_MAX, big) never displaces pads
        for i in range(k):
            less = (tc < ts[i]) | ((tc == ts[i]) & (ic < ids[i]))
            ts[i], tc = jnp.where(less, tc, ts[i]), jnp.where(less, ts[i], tc)
            ids[i], ic = jnp.where(less, ic, ids[i]), jnp.where(less, ids[i], ic)
        return ts, ids

    def walk(g, nidx, esc, leaf_row, is_leaf, live):
        oxv, oyv, ozv, dxv, dyv, dzv, ix, iy, iz, tmax = rays_g[g]
        upper = jnp.minimum(ts_s[g, k - 1], tmax)
        boxed = _slab(oxv, oyv, ozv, ix, iy, iz, nf, nidx, t_min, upper)
        want = jnp.any(boxed) & live

        @pl.when(want & is_leaf)
        def _():
            ts = [ts_s[g, i] for i in range(k)]
            ids = [ids_o[0, g, i] for i in range(k)]
            row, tid_at = fetch_g[g](leaf_row)
            for j in range(LEAF_CAP):
                t, u, v, det = _mt_scalar_tri(oxv, oyv, ozv, dxv, dyv, dzv,
                                              row, 9 * j)
                tid = tid_at(j)
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
                ts_s[g, i] = ts[i]
                ids_o[0, g, i] = ids[i]

        return jnp.where(want & jnp.logical_not(is_leaf), nidx + 1, esc)

    _interleaved_walk(ni, walks, walk)
    for g in range(walks):
        for i in range(k):
            # unfilled slots carry the big-id sentinel -> emit -1 like the oracle
            ids_o[0, g, i] = jnp.where(ids_o[0, g, i] == big_id, -1,
                                       ids_o[0, g, i])


def k_nearest_ids_pallas(
    rays: Rays,
    tris: Triangles,
    packed: PackedBVH,
    k: int,
    band: float,
    t_min: float = DEFAULT_T_MIN,
    t_max=T_MAX,
    sub: int = DEFAULT_SUB,
    walks: int = DEFAULT_WALKS,
) -> Array:
    """Nearest-k extended-hit tri ids per ray, (N, k) int32 (-1 = none)."""
    plan = _plan(packed)
    if plan is None:
        _log_fallback("k_nearest_ids_pallas", packed)
        from tpurt.accel.packet import k_nearest_ids_packet

        return k_nearest_ids_packet(rays, tris, packed, k, band, t_min, t_max)
    nf2, ni2, packed, tri_in_hbm = plan
    # The walk is a non-differentiable lookup (pallas_call has no JVP
    # rule; the diff layer recomputes attributes from ids) — cut the
    # tangent path on the INPUTS: stop_gradient on the output alone
    # still traces JVP into the kernel and crashes (found by /verify).
    rays = jax.lax.stop_gradient(rays)
    nf2, ni2 = jax.lax.stop_gradient((nf2, ni2))
    packed = jax.lax.stop_gradient(packed)
    shape = rays.shape
    tmax_flat = jax.lax.stop_gradient(
        jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
    ).reshape(-1)
    (ox, oy, oz, dx, dy, dz, tm), p, n = _pad_tiles(rays, sub, tmax_flat,
                                                    walks=walks)
    ids = pl.pallas_call(
        functools.partial(_knear_kernel, t_min=t_min, k=k, band=band, sub=sub,
                          walks=walks, tri_in_hbm=tri_in_hbm),
        grid=(p,),
        in_specs=_tri_specs(tri_in_hbm) + [_ray_spec(sub, walks)] * 7,
        out_specs=pl.BlockSpec(
            (1, walks, k, sub, LANE), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((p, walks, k, sub, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((walks, k, sub, LANE), jnp.float32)]
        + _leaf_scratch(tri_in_hbm, walks),
        interpret=_interpret(),
    )(nf2, ni2, packed.tri_rows, packed.tri_ids, ox, oy, oz, dx, dy, dz, tm)
    # (p, walks, k, sub, 128) -> (p*walks*sub*128, k)
    ids = jnp.moveaxis(ids, 2, 4).reshape(-1, k)
    return ids[:n]
