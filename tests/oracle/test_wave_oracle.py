"""Wavefront traversal engine vs per-ray reference and brute force.

accel/wavefront.py advances all rays in lockstep but visits nodes per ray in
the same DFS escape-link order with the same accept and tie-break rules, so
results are bitwise identical to traverse_ref / intersect_brute.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel.intersect import intersect_brute, occluded_brute
from tpurt.accel.lbvh import build_lbvh
from tpurt.accel.wavefront import wave_closest, wave_k_ids, wave_occluded
from tpurt.core.geometry import Rays
from tpurt.core.scene import make_bunny_scene, make_cornell_box
from tpurt.diff.softvis import k_nearest_brute
from tpurt.render.pipeline import render

from tests.oracle.test_packet_oracle import (
    _images_match,
    random_rays,
    random_scene,
)


@pytest.fixture(scope="module", params=[13, 257])
def scene_bvh(request):
    tris = random_scene(request.param)
    return tris, build_lbvh(tris, leaf_size=8)


def test_wave_closest_matches_brute(scene_bvh):
    tris, bvh = scene_bvh
    rays = random_rays(700)
    ref = intersect_brute(rays, tris)
    out = wave_closest(rays, tris, bvh)
    assert jnp.array_equal(out.tri, ref.tri)
    assert jnp.allclose(out.t, ref.t, rtol=1e-5, atol=1e-6)


def test_wave_occluded_matches_brute(scene_bvh):
    tris, bvh = scene_bvh
    rays = random_rays(700, seed=3)
    for tmax in [0.5, 10.0]:
        ref = occluded_brute(rays, tris, t_max=tmax)
        out = wave_occluded(rays, tris, bvh, t_max=tmax)
        assert jnp.array_equal(out, ref)


def test_wave_k_ids_match_brute():
    tris = random_scene(97, seed=5)
    bvh = build_lbvh(tris, leaf_size=8, band=0.1)
    rays = random_rays(300, seed=6)
    ref = k_nearest_brute(rays, tris, k=4, band=0.1)
    ids = wave_k_ids(rays, tris, bvh, k=4, band=0.1)
    assert jnp.array_equal(ids, ref.tri)


def test_wave_k_ids_per_ray_tmax():
    tris = random_scene(97, seed=5)
    bvh = build_lbvh(tris, leaf_size=8, band=0.1)
    rays = random_rays(64, seed=7)
    tmax = jnp.linspace(0.3, 5.0, 64)
    ref = k_nearest_brute(rays, tris, k=4, band=0.1, t_max=tmax[:, None])
    ids = wave_k_ids(rays, tris, bvh, k=4, band=0.1, t_max=tmax)
    assert jnp.array_equal(ids, ref.tri)


def test_wave_render_matches_brute_image():
    scene, cam = make_cornell_box()
    cam = cam.replace(width=64, height=64)
    ref = render(scene, cam, method="brute")
    img = render(scene, cam, method="wave")
    assert _images_match(img, ref)


def test_wave_render_bunny_bitwise_vs_bvh():
    scene, cam = make_bunny_scene(num_tris=2000)
    cam = cam.replace(width=64, height=64)
    ref = render(scene, cam, method="bvh")
    img = render(scene, cam, method="wave")
    assert jnp.array_equal(img, ref)


def test_wave_soft_render_matches_brute():
    scene, cam = make_cornell_box()
    cam = cam.replace(width=32, height=32)
    kw = dict(soft=True, k_layers=8, sharpness=30.0, band=0.25, k_occ=16)
    ref = render(scene, cam, method="brute", **kw)
    img = render(scene, cam, method="wave", **kw)
    # same ids/order; only ulp-level compositing reassociation may differ
    assert jnp.allclose(img, ref, atol=1e-5)
    assert _images_match(img, ref, max_diff_pixels=0)
