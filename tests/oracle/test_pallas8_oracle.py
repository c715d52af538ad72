"""BVH8 Pallas kernels vs the packet-engine oracle (SURVEY.md §4b).

Runs in Pallas interpret mode on CPU.  The contract is exact agreement with
accel/packet.py: the accept tests and the lexicographic (t, tri-id)
selection are identical and are visit-order- and superset-invariant, so the
wide traversal (different visit order, universal 8-aligned tri rows that may
test a few out-of-leaf triangles) must produce identical results.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel.bvh8 import build_wide
from tpurt.accel.lbvh import build_lbvh
from tpurt.accel.packet import (
    k_nearest_ids_packet,
    occluded_packet,
    traverse_packet,
)
from tpurt.core.geometry import Rays
from tpurt.kernels.traverse8 import (
    k_nearest_ids_pallas8,
    occluded_pallas8,
    plan8,
    traverse_pallas8,
    wide_bytes,
)
from tpurt.render.camera import gen_primary_rays
from tpurt.render.pipeline import make_tracer

from tests.oracle.test_pallas_oracle import _random_rays, _random_scene


@pytest.fixture(scope="module", params=["random", "cornell"])
def case(request):
    from tpurt.core.geometry import PointLight
    from tpurt.core.scene import Scene, make_cornell_box

    if request.param == "random":
        tris = _random_scene()
        rays = _random_rays()
    else:
        scene, cam = make_cornell_box()
        tris = scene.tris
        jitter = jnp.full((24 * 24, 2), 0.123456, jnp.float32)
        rays = gen_primary_rays(cam.replace(width=24, height=24), jitter)
        rays = Rays(o=rays.o.reshape(-1, 3), d=rays.d.reshape(-1, 3))
    scene = Scene.create(tris, PointLight.create((0, 3, 0), (1, 1, 1)))
    tracer = make_tracer(scene, method="packet")
    wide = build_wide(tris, build_lbvh(tris))
    return tris, rays, tracer.packed, wide


def test_closest_matches_packet(case):
    tris, rays, packed, wide = case
    got = traverse_pallas8(rays, tris, wide)
    ref = traverse_packet(rays, tris, packed)
    assert np.array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v), np.asarray(ref.v), atol=1e-5)


def test_occluded_matches_packet(case):
    tris, rays, packed, wide = case
    tmax = jnp.full(rays.shape, 2.5, jnp.float32)
    got = occluded_pallas8(rays, tris, wide, tmax)
    ref = occluded_packet(rays, tris, packed, tmax)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def _assert_klists_match(got, ref, max_order_flips=0):
    """K-list contract across differently-COMPILED engines: per-ray id SETS
    exactly equal; ORDER may flip only on near-tie pairs whose t's differ by
    compiler FMA-contraction ulps (measured: brute agrees with each engine on
    half of such flips — pure ulp noise, bounded tightly here)."""
    got, ref = np.asarray(got), np.asarray(ref)
    assert np.array_equal(np.sort(got, axis=-1), np.sort(ref, axis=-1)), (
        "k-nearest id SETS differ"
    )
    flips = int((got != ref).any(-1).sum())
    assert flips <= max_order_flips, f"{flips} order flips > {max_order_flips}"


@pytest.mark.parametrize("k,band", [(4, 0.0), (8, 0.15)])
def test_k_nearest_matches_packet(case, k, band):
    tris, rays, packed, wide = case
    if band > 0.0:
        # band-extended hits lie OUTSIDE un-inflated boxes; whether they are
        # found is then engine-dependent (make_tracer documents the matching
        # requirement) — build band-matched layouts for this comparison.
        from tpurt.core.geometry import PointLight
        from tpurt.core.scene import Scene

        wide = build_wide(tris, build_lbvh(tris, band=band))
        scene = Scene.create(tris, PointLight.create((0, 3, 0), (1, 1, 1)))
        packed = make_tracer(scene, method="packet", band=band).packed
    got = k_nearest_ids_pallas8(rays, tris, wide, k=k, band=band)
    ref = k_nearest_ids_packet(rays, tris, packed, k=k, band=band)
    _assert_klists_match(got, ref, max_order_flips=max(2, got.shape[0] // 500))


def test_hbm_tier_matches_packet(case, monkeypatch):
    """Force the HBM-triangle tier (fat-leaf rows DMA'd per leaf visit) by
    shrinking the VMEM budget below the tri-row footprint: results must stay
    identical (the r1/r2 failure class was tiers tested only where they
    trivially fit)."""
    import tpurt.kernels.traverse8 as k8

    tris, rays, packed, wide = case
    budget = wide_bytes(wide) + k8._SCRATCH_HEADROOM + 64
    monkeypatch.setattr(k8, "VMEM_BUDGET_BYTES", budget)
    assert k8.plan8(wide) == (True,)
    got = k8.traverse_pallas8(rays, tris, wide)
    ref = traverse_packet(rays, tris, packed)
    assert np.array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    tmax = jnp.full(rays.shape, 2.5, jnp.float32)
    occ = k8.occluded_pallas8(rays, tris, wide, tmax)
    occ_ref = occluded_packet(rays, tris, packed, tmax)
    assert np.array_equal(np.asarray(occ), np.asarray(occ_ref))
    ids = k8.k_nearest_ids_pallas8(rays, tris, wide, k=4, band=0.0)
    ids_ref = k_nearest_ids_packet(rays, tris, packed, k=4, band=0.0)
    _assert_klists_match(ids, ids_ref, max_order_flips=max(2, ids.shape[0] // 500))


def test_band_inflated_build(case):
    """Soft path: band-inflated boxes still find every extended hit."""
    from tpurt.core.geometry import PointLight
    from tpurt.core.scene import Scene

    tris, rays, packed, _ = case
    band = 0.15
    wide = build_wide(tris, build_lbvh(tris, band=band))
    scene = Scene.create(tris, PointLight.create((0, 3, 0), (1, 1, 1)))
    tracer = make_tracer(scene, method="packet", band=band)
    got = k_nearest_ids_pallas8(rays, tris, wide, k=8, band=band)
    ref = k_nearest_ids_packet(rays, tris, tracer.packed, k=8, band=band)
    _assert_klists_match(got, ref, max_order_flips=max(2, got.shape[0] // 500))
