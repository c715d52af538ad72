"""WideBVH collapse/pack invariants (accel/bvh8.py).

The greedy host-side collapse must partition the triangle range exactly:
fat-leaf ranges are disjoint and cover [0, N), every non-root wide node is
referenced exactly once, entry counts respect arity, and fat leaves span at
most R_MAX_ROWS universal rows.  refit_wide after a vertex move must equal a
fresh pack of the same topology.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel.bvh8 import (
    ENTRIES,
    FAT_TRIS,
    R_MAX_ROWS,
    build_wide,
    collapse8,
    pack_wide,
    refit_wide,
)
from tpurt.accel.lbvh import build_lbvh
from tpurt.accel.refit import refit_aabbs
from tpurt.core.scene import make_bunny_scene, make_cornell_box


def _decode_leaf(meta: int):
    enc = ~meta
    return enc >> 3, (enc & 7) + 1


def _check_invariants(en, em, own, esc, has_int, first, last, n):
    w = en.shape[0]
    covered = np.zeros(n, bool)
    child_refs = np.zeros(w, np.int64)

    def end(wi):  # first DFS id after wi's subtree
        return int(esc[wi]) if esc[wi] >= 0 else w

    assert int(own[0]) == 0, "wide 0 must anchor the root node"
    for wi in range(w):
        n_entries = int((en[wi] >= 0).sum())
        assert 1 <= n_entries <= ENTRIES
        # valid entries are a prefix (sorted by range start at build)
        assert (en[wi, :n_entries] >= 0).all()
        kids = []
        for e in range(n_entries):
            node = int(en[wi, e])
            m = int(em[wi, e])
            if m < 0:  # fat leaf
                f, l = int(first[node]), int(last[node])
                assert l - f + 1 <= FAT_TRIS
                r0, nr = _decode_leaf(m)
                assert r0 == f // 8 and nr == l // 8 - f // 8 + 1
                assert nr <= R_MAX_ROWS
                assert not covered[f : l + 1].any(), "leaf ranges overlap"
                covered[f : l + 1] = True
            else:
                assert 0 < m < w, "child wide id out of range / self-ref root"
                child_refs[m] += 1
                kids.append(m)
        assert bool(has_int[wi]) == (len(kids) > 0)
        # DFS escape threading: first child is wi+1, each child's subtree
        # ends where the next begins, last child's subtree ends with wi's.
        if kids:
            kids.sort()
            assert kids[0] == wi + 1, "first internal child must be wi+1"
            for a, b in zip(kids, kids[1:]):
                assert end(a) == b, "sibling escape must chain"
            assert end(kids[-1]) == end(wi), "last child must escape with parent"
    assert covered.all(), "fat leaves must cover every triangle"
    assert (child_refs[1:] == 1).all(), "every non-root wide referenced once"
    assert child_refs[0] == 0, "root must not be referenced"


@pytest.mark.parametrize("n", [1, 2, 7, 16, 17, 100, 1000])
def test_collapse_invariants_random(n):
    rng = np.random.default_rng(n)
    verts = rng.normal(size=(3 * n, 3)).astype(np.float32)
    faces = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    from tpurt.core.geometry import Triangles

    tris = Triangles(
        verts=jnp.asarray(verts),
        faces=jnp.asarray(faces),
        albedo=jnp.ones((n, 3), jnp.float32),
        emission=jnp.zeros((n, 3), jnp.float32),
    )
    bvh = build_lbvh(tris)
    left, right, first, last = jax.device_get(
        (bvh.left, bvh.right, bvh.first, bvh.last)
    )
    en, em, own, esc, has_int = collapse8(
        np.asarray(left), np.asarray(right),
        np.asarray(first), np.asarray(last))
    _check_invariants(en, em, own, esc, has_int, first, last, n)


def test_pack_and_refit_consistent():
    scene, _ = make_bunny_scene(num_tris=900)
    bvh = build_lbvh(scene.tris)
    wide = build_wide(scene.tris, bvh)
    # move vertices, refit the binary BVH, then refit the wide layout
    tris2 = scene.tris.replace(verts=scene.tris.verts * 1.1 + 0.03)
    bvh2 = refit_aabbs(bvh, tris2)
    w_refit = refit_wide(wide, bvh2, tris2)
    # the leaf-row map is a pure function of (leaf mask, ranges): re-derive
    # it so a fresh pack uses the identical aligned rows
    from tpurt.accel.bvh8 import align_leaf_rows

    em2, rf, rl = align_leaf_rows(
        np.asarray(wide.entry_node), np.asarray(wide.entry_meta),
        np.asarray(bvh.first), np.asarray(bvh.last),
    )
    np.testing.assert_array_equal(em2, np.asarray(wide.entry_meta))
    w_fresh = jax.jit(pack_wide)(
        tris2, bvh2, wide.entry_node, wide.entry_meta,
        wide.own_node, wide.escape, wide.has_int,
        jnp.asarray(rf), jnp.asarray(rl),
    )
    for a, b in zip(jax.tree_util.tree_leaves(w_refit),
                    jax.tree_util.tree_leaves(w_fresh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # rows_from_table (the fit step's cheap repack from the prebuilt
    # (T, 15) tri_table) must be BITWISE equal to the vertex-gather path
    from tpurt.render.pipeline import tri_table

    w_tbl = refit_wide(wide, bvh2, tris2, table=tri_table(tris2))
    np.testing.assert_array_equal(
        np.asarray(w_tbl.tri_rows), np.asarray(w_refit.tri_rows))

    # refit_wide_direct (no binary RMQ: bottom-up fold over the wide
    # topology) must be BITWISE equal — f32 min/max are exactly
    # associative, and entries cover exactly their subtree's leaves
    from tpurt.accel.bvh8 import refit_wide_direct

    w_direct = jax.jit(refit_wide_direct)(wide, tris2)
    np.testing.assert_array_equal(
        np.asarray(w_direct.wrow), np.asarray(w_refit.wrow))
    np.testing.assert_array_equal(
        np.asarray(w_direct.tri_rows), np.asarray(w_refit.tri_rows))


def test_refit_wide_direct_band():
    """Band-inflated (soft-path) refit: direct fold == RMQ path.

    Box lanes may differ by ~1 ulp: the band inflation `band*x + 1e-7` is
    FMA-fused differently in the two jitted programs (min/max themselves
    are exact — the band=0 comparison above is bitwise).  Boxes are
    conservative (+1e-7 margin), so ulp jitter is harmless; the integer
    lanes (metas/escape/flags) and the triangle rows must stay bitwise."""
    scene, _ = make_bunny_scene(num_tris=700)
    bvh = build_lbvh(scene.tris, band=0.1)
    wide = build_wide(scene.tris, bvh)
    assert wide.band == 0.1
    tris2 = scene.tris.replace(
        verts=scene.tris.verts * 0.93 + jnp.asarray([0.02, -0.01, 0.05]))
    bvh2 = refit_aabbs(bvh, tris2, update_flat=False)
    from tpurt.accel.bvh8 import refit_wide_direct
    from tpurt.render.pipeline import tri_table

    ref = refit_wide(wide, bvh2, tris2)
    direct = jax.jit(refit_wide_direct)(wide, tris2,
                                        table=tri_table(tris2))
    a = np.asarray(ref.wrow).reshape(-1, 64)
    b = np.asarray(direct.wrow).reshape(-1, 64)
    # integer-encoded lanes: metas 48-55, escape 62, flag 63 — bitwise
    np.testing.assert_array_equal(a[:, 48:56], b[:, 48:56])
    np.testing.assert_array_equal(a[:, 62:64], b[:, 62:64])
    # box lanes (entries 0-47, own box 56-61): ulp-level agreement
    np.testing.assert_allclose(a[:, 0:48], b[:, 0:48], rtol=3e-6, atol=1e-6)
    np.testing.assert_allclose(a[:, 56:62], b[:, 56:62], rtol=3e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(direct.tri_rows),
                                  np.asarray(ref.tri_rows))


def test_single_triangle_scene():
    scene, _ = make_cornell_box()
    t = scene.tris
    tris = t.replace(faces=t.faces[:1], albedo=t.albedo[:1],
                     emission=t.emission[:1])
    bvh = build_lbvh(tris)
    wide = build_wide(tris, bvh)
    assert wide.num_wides == 1


def test_lane_codec_roundtrip():
    """encode_lane_i32/decode must roundtrip every value class and never
    produce a denormal OR NaN/inf f32 pattern (TPUs flush denormals between
    packing and the kernel's row load — measured on v5e, VERDICT-class bug;
    the r4 codec keeps everything in the negative-normal class)."""
    from tpurt.accel.bvh8 import (
        LANE_MAX, LANE_MIN, decode_lane_i32, encode_lane_i32,
    )

    v = jnp.asarray([-1, 0, 1, 2, 7, 1000, 2**20, 2**23 - 2,
                     -2, -11, -(2**22) + 1,
                     # 5M/30M-tri-config metas the r3 24-bit codec wrapped
                     ~(((5_000_000 // 8) << 3) | 7),
                     ~(((30_000_000 // 8) << 3) | 7), 5_000_000, 40_000_000,
                     LANE_MIN, LANE_MAX], jnp.int32)
    enc = encode_lane_i32(v)
    bits = np.asarray(jax.lax.bitcast_convert_type(enc, jnp.int32)).astype(np.uint32)
    exp = (bits >> 23) & 0xFF
    assert (exp != 0).all(), "denormal encodings are flushed on TPU"
    assert (exp != 0xFF).all(), "NaN/inf encodings are not a preserved class"
    dec = decode_lane_i32(jax.lax.bitcast_convert_type(enc, jnp.int32))
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(v))
    # all-zero pad rows must decode to an INVALID (negative) tri id
    assert int(decode_lane_i32(jnp.int32(0))) < 0


@pytest.mark.parametrize("n", [2, 7, 16, 17, 100, 1000, 4097])
def test_collapse_vectorized_matches_serial(n):
    """The wave-synchronous numpy collapse must reproduce the serial greedy
    reference bitwise (same entries, same DFS numbering, same escapes)."""
    from tpurt.accel.bvh8 import _collapse8_serial
    from tpurt.core.geometry import Triangles

    rng = np.random.default_rng(n * 7 + 1)
    verts = rng.normal(size=(3 * n, 3)).astype(np.float32)
    faces = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    tris = Triangles(
        verts=jnp.asarray(verts),
        faces=jnp.asarray(faces),
        albedo=jnp.ones((n, 3), jnp.float32),
        emission=jnp.zeros((n, 3), jnp.float32),
    )
    bvh = build_lbvh(tris)
    left, right, first, last = (
        np.asarray(x) for x in jax.device_get(
            (bvh.left, bvh.right, bvh.first, bvh.last))
    )
    got = collapse8(left, right, first, last)
    ref = _collapse8_serial(left, right, first, last)
    for g, r, name in zip(got, ref, ("en", "em", "own", "esc", "has_int")):
        np.testing.assert_array_equal(g, r, err_msg=name)
    # and with the SAH (surface-area) split priority (the production rule)
    from tpurt.accel.bvh8 import node_areas

    area = node_areas(*jax.device_get((bvh.node_lo, bvh.node_hi)))
    got = collapse8(left, right, first, last, priority=area)
    ref = _collapse8_serial(left, right, first, last, priority=area)
    for g, r, name in zip(got, ref, ("en", "em", "own", "esc", "has_int")):
        np.testing.assert_array_equal(g, r, err_msg="area:" + name)


def test_stack_bound_covers_kernel_stack():
    """build_wide must record a worst-case stack occupancy and it must fit
    the traversal kernel's scratch for every test scene (ADVICE r3)."""
    from tpurt.kernels.traverse8 import STACKV

    scene, _ = make_bunny_scene(num_tris=3000)
    bvh = build_lbvh(scene.tris)
    wide = build_wide(scene.tris, bvh)
    assert 0 < wide.max_stack <= STACKV
