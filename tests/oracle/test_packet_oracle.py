"""Packet traversal engine vs per-ray reference and brute force.

Contract (accel/packet.py): packets visit a superset of each ray's nodes but
per-(ray,tri) accept tests are self-contained, so closest hits are bitwise
identical to traverse_ref / intersect_brute (same lower-id tie-break).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel.intersect import intersect_brute, occluded_brute
from tpurt.accel.lbvh import build_lbvh
from tpurt.accel.packet import (
    k_nearest_ids_packet,
    occluded_packet,
    pack_bvh,
    refit_packed,
    traverse_packet,
)
from tpurt.accel.refit import refit_aabbs
from tpurt.core.geometry import Rays, Triangles
from tpurt.core.scene import make_bunny_scene, make_cornell_box
from tpurt.diff.softvis import k_nearest_brute
from tpurt.render.camera import gen_primary_rays
from tpurt.render.pipeline import render


def random_scene(n_tris=257, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1, 1, (n_tris, 3))
    v1 = base + 0.25 * rng.standard_normal((n_tris, 3))
    v2 = base + 0.25 * rng.standard_normal((n_tris, 3))
    verts = np.concatenate([base, v1, v2]).astype(np.float32)
    n = n_tris
    faces = np.stack(
        [np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n], -1
    ).astype(np.int32)
    return Triangles.create(verts, faces)


def random_rays(n=500, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    return Rays(o=jnp.asarray(o), d=jnp.asarray(d))


@pytest.fixture(scope="module", params=[13, 257])
def scene_pack(request):
    tris = random_scene(request.param)
    bvh = build_lbvh(tris, leaf_size=8)
    return tris, bvh, pack_bvh(tris, bvh)


def test_closest_matches_brute(scene_pack):
    tris, _, packed = scene_pack
    rays = random_rays(700)
    ref = intersect_brute(rays, tris)
    out = traverse_packet(rays, tris, packed)
    assert jnp.array_equal(out.tri, ref.tri)
    assert jnp.allclose(out.t, ref.t, rtol=1e-5, atol=1e-6)


def test_occluded_matches_brute(scene_pack):
    tris, _, packed = scene_pack
    rays = random_rays(700, seed=3)
    for tmax in [0.5, 10.0]:
        ref = occluded_brute(rays, tris, t_max=tmax)
        out = occluded_packet(rays, tris, packed, t_max=tmax)
        assert jnp.array_equal(out, ref)


def test_k_nearest_ids_match_brute():
    tris = random_scene(97, seed=5)
    bvh = build_lbvh(tris, leaf_size=8, band=0.1)
    packed = pack_bvh(tris, bvh)
    rays = random_rays(300, seed=6)
    ref = k_nearest_brute(rays, tris, k=4, band=0.1)
    ids = k_nearest_ids_packet(rays, tris, packed, k=4, band=0.1)
    assert jnp.array_equal(ids, ref.tri)


def _images_match(img, ref, max_diff_pixels=4):
    """Equal everywhere except <= max_diff_pixels: rays exactly on shared
    edges of coplanar triangles can flip ulp-level t ties between engines."""
    d = jnp.max(jnp.abs(img - ref), axis=-1)
    return int(jnp.sum(d > 1e-5)) <= max_diff_pixels


def test_packet_render_matches_brute_image():
    scene, cam = make_cornell_box()
    cam = cam.replace(width=64, height=64)
    ref = render(scene, cam, method="brute")
    img = render(scene, cam, method="packet")
    assert _images_match(img, ref)


def test_packet_render_bunny_matches_bvh():
    scene, cam = make_bunny_scene(num_tris=2000)
    cam = cam.replace(width=64, height=64)
    ref = render(scene, cam, method="bvh")
    img = render(scene, cam, method="packet")
    assert _images_match(img, ref)


def test_refit_packed_tracks_vertices(scene_pack):
    tris, bvh, packed = scene_pack
    moved = tris.replace(verts=tris.verts * 1.1 + 0.05)
    bvh2 = refit_aabbs(bvh, moved)
    packed2 = jax.jit(refit_packed)(packed, bvh2, moved)
    rays = random_rays(300, seed=9)
    ref = intersect_brute(rays, moved)
    out = traverse_packet(rays, moved, packed2)
    assert jnp.array_equal(out.tri, ref.tri)


def test_packet_soft_render_close_to_brute():
    # k_layers=8 covers every extended candidate in this scene so equal-t
    # insertion-order ties between engines cannot truncate different subsets
    # (same settings as the bvh-vs-brute soft oracle).
    scene, cam = make_cornell_box()
    cam = cam.replace(width=32, height=32)
    kw = dict(soft=True, k_layers=8, sharpness=30.0, band=0.25, k_occ=16)
    ref = render(scene, cam, method="brute", **kw)
    img = render(scene, cam, method="packet", **kw)
    assert jnp.allclose(img, ref, rtol=2e-3, atol=2e-3)
