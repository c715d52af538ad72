"""Oracle/differential tests (SURVEY.md §4b): BVH traversal variants vs the
brute-force O(R·T) ground truth on randomized scenes and the staged configs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel.intersect import intersect_brute, occluded_brute
from tpurt.accel.lbvh import build_lbvh
from tpurt.accel.traverse_ref import (
    k_nearest_ref,
    occluded_ref,
    soft_occlusion_ref,
    traverse_ref,
)
from tpurt.core.geometry import Rays, Triangles
from tpurt.core.scene import make_bunny_scene, make_cornell_box
from tpurt.diff.softvis import k_nearest_brute, soft_occlusion_brute
from tpurt.render.camera import gen_primary_rays
from tpurt.render.pipeline import make_tracer, render


def random_tris(n, key=0, spread=3.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    centers = jax.random.uniform(k1, (n, 1, 3), minval=-spread, maxval=spread)
    offsets = jax.random.normal(k2, (n, 3, 3)) * 0.4
    v = (centers + offsets).reshape(-1, 3)
    f = jnp.arange(n * 3, dtype=jnp.int32).reshape(n, 3)
    return Triangles.create(v, f)


def random_rays(r, key=10, spread=3.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    o = jax.random.uniform(k1, (r, 3), minval=-2 * spread, maxval=2 * spread)
    d = jax.random.normal(k2, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(o=o, d=d)


def assert_hits_match(hit_a, hit_b, tris, o, d):
    """Hits agree: same validity, same t (same tri up to coplanar dupes)."""
    va, vb = np.asarray(hit_a.valid), np.asarray(hit_b.valid)
    np.testing.assert_array_equal(va, vb)
    ta, tb = np.asarray(hit_a.t), np.asarray(hit_b.t)
    both = va & vb
    np.testing.assert_allclose(ta[both], tb[both], rtol=1e-4, atol=1e-5)
    same_tri = np.asarray(hit_a.tri) == np.asarray(hit_b.tri)
    # When tri ids differ the ts must still agree (tie between tris).
    assert (same_tri | ~both).mean() > 0.98 or np.allclose(
        ta[both], tb[both], rtol=1e-4
    )


@pytest.mark.parametrize("n,leaf", [(1, 4), (2, 1), (37, 2), (300, 8)])
def test_closest_hit_matches_brute_random(n, leaf):
    tris = random_tris(n, key=n)
    rays = random_rays(256, key=n + 1)
    bvh = build_lbvh(tris, leaf_size=leaf)
    hit_ref = traverse_ref(rays, tris, bvh)
    hit_bf = intersect_brute(rays, tris)
    assert_hits_match(hit_ref, hit_bf, tris, rays.o, rays.d)


def test_closest_hit_matches_brute_cornell_camera():
    scene, cam = make_cornell_box()
    cam = cam.replace(width=32, height=32)
    rays = gen_primary_rays(cam)
    bvh = build_lbvh(scene.tris, leaf_size=4)
    hit_ref = traverse_ref(rays, scene.tris, bvh)
    hit_bf = intersect_brute(rays, scene.tris)
    np.testing.assert_array_equal(
        np.asarray(hit_ref.valid), np.asarray(hit_bf.valid)
    )
    both = np.asarray(hit_ref.valid)
    np.testing.assert_allclose(
        np.asarray(hit_ref.t)[both], np.asarray(hit_bf.t)[both], rtol=1e-4
    )


def test_occlusion_matches_brute():
    tris = random_tris(150, key=7)
    rays = random_rays(300, key=8)
    bvh = build_lbvh(tris, leaf_size=8)
    t_max = 4.0
    occ_ref = np.asarray(occluded_ref(rays, tris, bvh, t_max=t_max))
    occ_bf = np.asarray(occluded_brute(rays, tris, t_max=t_max))
    np.testing.assert_array_equal(occ_ref, occ_bf)


def test_k_nearest_matches_brute():
    band = 0.2
    tris = random_tris(80, key=11)
    rays = random_rays(200, key=12)
    bvh = build_lbvh(tris, leaf_size=4, band=band)
    kh_ref = k_nearest_ref(rays, tris, bvh, k=4, band=band)
    kh_bf = k_nearest_brute(rays, tris, k=4, band=band)
    # Same set of (finite) layer ts per ray.
    ta = np.sort(np.asarray(kh_ref.t), axis=-1)
    tb = np.sort(np.asarray(kh_bf.t), axis=-1)
    finite = tb < 1e29
    np.testing.assert_allclose(ta[finite], tb[finite], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(kh_ref.tri >= 0), np.asarray(kh_bf.tri >= 0)
    )


def test_soft_occlusion_matches_brute():
    band = 0.2
    tris = random_tris(60, key=13)
    rays = random_rays(150, key=14)
    bvh = build_lbvh(tris, leaf_size=4, band=band)
    t_max = jnp.full((150,), 5.0)
    v_ref = np.asarray(
        soft_occlusion_ref(rays, tris, bvh, 40.0, band=band, t_max=t_max)
    )
    v_bf = np.asarray(
        soft_occlusion_brute(rays, tris, 40.0, band=band, t_max=t_max)
    )
    np.testing.assert_allclose(v_ref, v_bf, rtol=1e-4, atol=1e-5)


def test_bvh_render_matches_brute_render_cornell():
    scene, cam = make_cornell_box()
    # Nudge the eye off-center: a perfectly centered camera fires rays through
    # exact wall-junction seams where closest-hit tie-breaking is ambiguous.
    cam = cam.replace(
        width=32, height=32, eye=jnp.array([0.5071, 0.4913, 2.2])
    )
    img_bf = np.asarray(render(scene, cam, method="brute"))
    img_bvh = np.asarray(render(scene, cam, method="bvh"))
    np.testing.assert_allclose(img_bvh, img_bf, rtol=1e-4, atol=1e-5)


def test_bvh_soft_render_matches_brute_soft_render():
    scene, cam = make_cornell_box()
    cam = cam.replace(
        width=24, height=24, eye=jnp.array([0.5071, 0.4913, 2.2])
    )
    kw = dict(soft=True, k_layers=8, sharpness=30.0, band=0.25, k_occ=16)
    tracer = make_tracer(scene, "bvh", band=0.25)
    img_bvh = np.asarray(render(scene, cam, tracer=tracer, **kw))
    img_bf = np.asarray(render(scene, cam, method="brute", **kw))
    np.testing.assert_allclose(img_bvh, img_bf, rtol=2e-3, atol=2e-3)


def test_bunny_bvh_renders():
    """Bunny-class scene via the pure-JAX BVH path (BASELINE.json:8 at
    reduced res for CPU test budget)."""
    scene, cam = make_bunny_scene(num_tris=4000)
    cam = cam.replace(width=64, height=64)
    img = np.asarray(render(scene, cam, method="bvh"))
    assert np.isfinite(img).all()
    assert (img.sum(-1) > 0).mean() > 0.9  # background + lit object
    # the knot occupies the middle of the frame
    assert img[24:40, 24:40].mean() > 0.02
