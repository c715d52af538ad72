"""Unit tests for the acceleration layer (SURVEY.md §4b 'Unit'):
morton interleave vs naive loop, radix sort vs argsort, Karras tree
invariants, refit containment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel.lbvh import build_lbvh, build_radix_tree, _delta
from tpurt.accel.morton import (
    expand_bits,
    expand_bits_naive,
    morton3d,
    triangle_morton_codes,
)
from tpurt.accel.refit import refit_aabbs
from tpurt.accel.sort_ref import radix_sort_ref, sort_pairs
from tpurt.core.geometry import AABB, Triangles
from tpurt.core.scene import make_bunny_scene, make_cornell_box


def random_tris(n, key=0, spread=4.0):
    k = jax.random.PRNGKey(key)
    k1, k2 = jax.random.split(k)
    centers = jax.random.uniform(k1, (n, 1, 3), minval=-spread, maxval=spread)
    offsets = jax.random.normal(k2, (n, 3, 3)) * 0.3
    v = (centers + offsets).reshape(-1, 3)
    f = jnp.arange(n * 3, dtype=jnp.int32).reshape(n, 3)
    return Triangles.create(v, f)


# ----------------------------------------------------------------- morton --
def test_expand_bits_vs_naive():
    x = jnp.arange(1024, dtype=jnp.uint32)
    np.testing.assert_array_equal(
        np.asarray(expand_bits(x)), np.asarray(expand_bits_naive(x))
    )


def test_morton_locality_order():
    # Points along a diagonal must be monotonically ordered by morton code.
    t = jnp.linspace(0.01, 0.99, 64)[:, None]
    pts = t * jnp.ones((1, 3))
    b = AABB(lo=jnp.zeros(3), hi=jnp.ones(3))
    codes = np.asarray(morton3d(pts, b))
    assert (np.diff(codes.astype(np.int64)) > 0).all()


def test_morton_octant_msb():
    b = AABB(lo=jnp.zeros(3), hi=jnp.ones(3))
    lo_pt = jnp.array([[0.1, 0.1, 0.1]])
    hi_pt = jnp.array([[0.9, 0.9, 0.9]])
    c_lo = int(morton3d(lo_pt, b)[0])
    c_hi = int(morton3d(hi_pt, b)[0])
    assert c_lo >> 27 == 0  # all top bits zero in low octant
    assert c_hi >> 27 == 7  # all top bits set in high octant


# ------------------------------------------------------------------- sort --
def test_radix_sort_ref_matches_argsort():
    key = jax.random.PRNGKey(1)
    keys = jax.random.randint(key, (999,), 0, 2**31 - 1).astype(jnp.uint32)
    vals = jnp.arange(999, dtype=jnp.int32)
    sk, sv = radix_sort_ref(keys, vals)
    order = np.argsort(np.asarray(keys), kind="stable")
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(keys)[order])
    np.testing.assert_array_equal(np.asarray(sv), order)


def test_radix_sort_ref_adversarial_duplicates():
    # All-equal keys must be a stable no-op permutation.
    keys = jnp.full((257,), 42, jnp.uint32)
    vals = jnp.arange(257, dtype=jnp.int32)
    sk, sv = radix_sort_ref(keys, vals)
    np.testing.assert_array_equal(np.asarray(sv), np.arange(257))


def test_sort_backends_agree():
    key = jax.random.PRNGKey(2)
    keys = jax.random.randint(key, (512,), 0, 1 << 30).astype(jnp.uint32)
    vals = jnp.arange(512, dtype=jnp.int32)
    k1, v1 = sort_pairs(keys, vals, backend="xla")
    k2, v2 = sort_pairs(keys, vals, backend="ref")
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


# ------------------------------------------------------------------- tree --
def check_tree_invariants(codes):
    n = codes.shape[0]
    left, right, parent, first, last = build_radix_tree(codes)
    left, right, parent, first, last = map(
        np.asarray, (left, right, parent, first, last)
    )
    # Each internal node's children point back to it.
    for i in range(n - 1):
        assert parent[left[i]] == i
        assert parent[right[i]] == i
    # Root is node 0 and has no parent; every other node has one.
    assert parent[0] == -1
    assert (parent[1:] >= 0).all()
    # Ranges: node i covers exactly the union of its children's ranges,
    # split contiguously.
    for i in range(n - 1):
        assert first[i] == first[left[i]]
        assert last[i] == last[right[i]]
        assert last[left[i]] + 1 == first[right[i]]
    # Root covers everything; leaf count == n.
    assert first[0] == 0 and last[0] == n - 1
    # Split position maximizes the prefix: delta across the split boundary
    # equals the node's delta (Karras property): children ranges are
    # contiguous and within-child deltas exceed the node delta.
    i_arr = jnp.arange(n - 1, dtype=jnp.int32)
    d_node = np.asarray(
        _delta(jnp.asarray(codes), i_arr, jnp.asarray(last[: n - 1]), n)
    )
    for i in range(n - 1):
        split = last[left[i]]
        d_split = np.asarray(
            _delta(
                jnp.asarray(codes),
                jnp.asarray([split], jnp.int32),
                jnp.asarray([split + 1], jnp.int32),
                n,
            )
        )[0]
        # all adjacent deltas strictly inside a child exceed the split delta
        for j in range(first[i], last[i]):
            dj = np.asarray(
                _delta(
                    jnp.asarray(codes),
                    jnp.asarray([j], jnp.int32),
                    jnp.asarray([j + 1], jnp.int32),
                    n,
                )
            )[0]
            assert dj >= d_split


@pytest.mark.parametrize("n", [2, 3, 17, 128])
def test_radix_tree_invariants_random(n):
    key = jax.random.PRNGKey(n)
    codes = jnp.sort(
        jax.random.randint(key, (n,), 0, 1 << 30).astype(jnp.uint32)
    )
    check_tree_invariants(codes)


def test_radix_tree_all_duplicate_codes():
    codes = jnp.full((32,), 123456, jnp.uint32)
    check_tree_invariants(codes)  # index tie-break must still give a tree


# ------------------------------------------------------------------ refit --
def test_bvh_containment_and_leaf_cover():
    tris = random_tris(200, key=3)
    bvh = build_lbvh(tris, leaf_size=4)
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    lo = np.asarray(bvh.node_lo)
    hi = np.asarray(bvh.node_hi)
    n = tris.num_tris
    # child AABBs inside parent AABBs
    for i in range(n - 1):
        for c in (left[i], right[i]):
            assert (lo[i] <= lo[c] + 1e-5).all()
            assert (hi[i] >= hi[c] - 1e-5).all()
    # root box contains all triangle boxes
    tb = AABB.of_triangles(tris)
    assert (lo[0] <= np.asarray(tb.lo).min(0) + 1e-5).all()
    assert (hi[0] >= np.asarray(tb.hi).max(0) - 1e-5).all()
    # flat leaves cover every sorted triangle exactly once
    is_leaf = np.asarray(bvh.flat_is_leaf)
    firsts = np.asarray(bvh.flat_first)[is_leaf]
    counts = np.asarray(bvh.flat_count)[is_leaf]
    covered = np.zeros(n, np.int32)
    for f, c in zip(firsts, counts):
        assert 1 <= c <= bvh.leaf_size
        covered[f : f + c] += 1
    assert (covered == 1).all()


def test_refit_tracks_moved_vertices():
    tris = random_tris(64, key=4)
    bvh = build_lbvh(tris, leaf_size=4)
    moved = tris.replace(verts=tris.verts * 1.5 + 0.25)
    bvh2 = refit_aabbs(bvh, moved)
    # Root box of refit BVH contains all moved triangles.
    tb = AABB.of_triangles(moved)
    assert (np.asarray(bvh2.node_lo[0]) <= np.asarray(tb.lo).min(0) + 1e-4).all()
    assert (np.asarray(bvh2.node_hi[0]) >= np.asarray(tb.hi).max(0) - 1e-4).all()
    # Topology untouched.
    np.testing.assert_array_equal(np.asarray(bvh.left), np.asarray(bvh2.left))
    np.testing.assert_array_equal(np.asarray(bvh.dfs), np.asarray(bvh2.dfs))


def test_escape_links_form_valid_dfs():
    tris = random_tris(100, key=5)
    bvh = build_lbvh(tris, leaf_size=4)
    esc = np.asarray(bvh.flat_escape)
    is_leaf = np.asarray(bvh.flat_is_leaf)
    count = np.asarray(bvh.flat_count)
    # Walk the threaded tree visiting every live node exactly once.
    seen = []
    node = 0
    steps = 0
    while node != -1 and steps < 10000:
        seen.append(node)
        node = int(esc[node]) if is_leaf[node] else node + 1
        steps += 1
    assert steps < 10000
    live = len(seen)
    assert sorted(seen) == list(range(live))  # preorder 0..live-1, each once
    # Leaves cover all tris (checked above); escape always jumps forward
    # or terminates.
    for i in seen:
        assert esc[i] == -1 or esc[i] > i


def test_max_cut_leaves_bounds_actual():
    """The static treelet-leaf bound (used for pack shapes so the build path
    has no device->host sync) must dominate the actual cut-leaf count."""
    import numpy as np

    from tpurt.accel.lbvh import build_lbvh
    from tpurt.accel.packet import max_cut_leaves
    from tpurt.core.geometry import Triangles

    rng = np.random.default_rng(0)
    for f in (2, 9, 37, 300, 2048):
        centers = rng.uniform(-2, 2, (f, 3)).astype(np.float32)
        offs = rng.normal(0, 0.3, (f, 3, 3)).astype(np.float32)
        verts = (centers[:, None, :] + offs).reshape(-1, 3)
        faces = np.arange(3 * f).reshape(f, 3)
        tris = Triangles.create(verts, faces)
        for leaf_size in (4, 8):
            bvh = build_lbvh(tris, leaf_size=leaf_size)
            actual = int(bvh.flat_is_leaf.sum())
            bound = max_cut_leaves(f, leaf_size)
            assert actual <= bound, (f, leaf_size, actual, bound)


def test_range_minmax_sparse_matches_levelsync():
    """The RMQ refit must reproduce the bottom-up child-fold BITWISE
    (min/max are exact, so overlapping windows change nothing)."""
    import jax
    import numpy as np
    from tpurt.accel.lbvh import build_lbvh, refit_node_aabbs
    from tpurt.accel.refit import range_minmax_sparse
    from tpurt.core.geometry import Triangles

    for n, seed in ((2, 0), (7, 1), (100, 2), (1000, 3)):
        rng = np.random.default_rng(seed)
        verts = rng.normal(size=(3 * n, 3)).astype(np.float32)
        faces = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
        tris = Triangles(
            verts=jnp.asarray(verts), faces=jnp.asarray(faces),
            albedo=jnp.ones((n, 3), jnp.float32),
            emission=jnp.zeros((n, 3), jnp.float32),
        )
        bvh = build_lbvh(tris)
        v0, v1, v2 = tris.corners()
        tlo = jnp.minimum(jnp.minimum(v0, v1), v2)[bvh.tri_order]
        thi = jnp.maximum(jnp.maximum(v0, v1), v2)[bvh.tri_order]
        lo_ref, hi_ref = refit_node_aabbs(bvh.left, bvh.right, tlo, thi, 128)
        lo, hi = range_minmax_sparse(tlo, thi, bvh.first, bvh.last)
        np.testing.assert_array_equal(np.asarray(lo), np.asarray(lo_ref))
        np.testing.assert_array_equal(np.asarray(hi), np.asarray(hi_ref))


@pytest.mark.parametrize("n,leaf_size,seed", [
    (2, 1, 0), (3, 1, 1), (17, 4, 2), (256, 8, 3), (1000, 8, 4), (1000, 16, 5),
])
def test_thread_dfs_closed_form_matches_levelsync(n, leaf_size, seed):
    """The O(sort) treelet-cut/DFS/escape formulas (accel/lbvh._thread_dfs)
    must be BITWISE identical to the level-synchronous reference on random
    trees, including trees with duplicate Morton codes."""
    from tpurt.accel.lbvh import _thread_dfs, _thread_dfs_ref

    rng = np.random.default_rng(seed)
    codes = jnp.asarray(
        np.sort(rng.integers(0, 2**30 if seed != 4 else 64, n, np.uint32))
    )
    left, right, parent, first, last = build_radix_tree(codes)
    args = (left, right, parent, first, last, leaf_size, 128)
    got = _thread_dfs(*args)
    ref = _thread_dfs_ref(*args)
    for g, r, name in zip(got, ref, ("dfs", "esc", "live", "is_eff_leaf")):
        g, r = np.asarray(g), np.asarray(r)
        if name == "esc":
            # reference leaves esc of dead nodes at whatever the converge
            # wrote; only live nodes' escapes are ever read
            liv = np.asarray(ref[2])
            np.testing.assert_array_equal(g[liv], r[liv], err_msg=name)
        else:
            np.testing.assert_array_equal(g, r, err_msg=name)


def test_blocked_rmq_matches_flat_table():
    """The O(N)-memory two-level RMQ (used above 2^21 leaves, where the flat
    (log N, N, 6) table is a multi-GB transient) must be BITWISE identical
    to the flat table — min is idempotent, so any grouping is exact."""
    from tpurt.accel.lbvh import _range_minmax_blocked, range_minmax_sparse

    rng = np.random.default_rng(7)
    for n in (2, 31, 32, 33, 64, 257, 4096, 70_000):
        codes = jnp.asarray(np.sort(rng.integers(0, 2**30, n, np.uint32)))
        _, _, _, first, last = build_radix_tree(codes)
        lo = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
        hi = lo + jnp.asarray(rng.uniform(0.01, 1.0, (n, 3)).astype(np.float32))
        ref_lo, ref_hi = range_minmax_sparse(lo, hi, first, last)
        box = jnp.concatenate([lo, -hi], axis=-1)
        m = _range_minmax_blocked(box, first, last)
        np.testing.assert_array_equal(np.asarray(m[..., :3]),
                                      np.asarray(ref_lo), err_msg=f"lo n={n}")
        np.testing.assert_array_equal(np.asarray(-m[..., 3:]),
                                      np.asarray(ref_hi), err_msg=f"hi n={n}")
