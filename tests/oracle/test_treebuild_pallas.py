"""Pallas treebuild kernels vs the XLA reference build (SURVEY.md §2b #7)."""

import jax.numpy as jnp
import numpy as np

from tpurt.accel.lbvh import build_radix_tree
from tpurt.accel.morton import morton3d, triangle_morton_codes
from tpurt.core.geometry import AABB
from tpurt.kernels.treebuild import morton_codes_pallas, radix_tree_pallas


def test_morton_kernel_matches_reference():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-3, 5, (3000, 3)).astype(np.float32))
    bounds = AABB(lo=jnp.array([-3.0, -3.0, -3.0]), hi=jnp.array([5.0, 5.0, 5.0]))
    got = morton_codes_pallas(pts, bounds)
    ref = morton3d(pts, bounds)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_radix_tree_kernel_matches_reference():
    rng = np.random.default_rng(1)
    codes = np.sort(rng.integers(0, 2**30, 700, dtype=np.uint32))
    got_l, got_r, got_p = radix_tree_pallas(jnp.asarray(codes))
    ref_l, ref_r, ref_p, _, _ = build_radix_tree(jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(ref_r))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))


def test_radix_tree_kernel_duplicate_codes():
    """All-duplicate codes exercise the index-bit tie-break (Karras §4)."""
    codes = np.full(257, 12345, np.uint32)
    got_l, got_r, got_p = radix_tree_pallas(jnp.asarray(codes))
    ref_l, ref_r, ref_p, _, _ = build_radix_tree(jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))
    np.testing.assert_array_equal(np.asarray(got_r), np.asarray(ref_r))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))
