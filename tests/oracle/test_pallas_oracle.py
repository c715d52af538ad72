"""Pallas traversal kernels vs the packet-engine oracle (SURVEY.md §4b).

Runs in Pallas interpret mode on CPU (kernels/traverse selects it from the
backend). The contract is exact agreement with accel/packet.py — same visit
order, same MT formulation, same tie-breaks — on a randomized scene and on
the Cornell box.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel.packet import (
    k_nearest_ids_packet,
    occluded_packet,
    pack_bvh,
    traverse_packet,
)
from tpurt.core.geometry import Rays, Triangles
from tpurt.core.scene import make_cornell_box
from tpurt.kernels.traverse import (
    fits_vmem,
    k_nearest_ids_pallas,
    occluded_pallas,
    traverse_pallas,
)
from tpurt.render.camera import gen_primary_rays
from tpurt.render.pipeline import make_tracer


def _random_scene(f=200, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-2, 2, (f, 3)).astype(np.float32)
    offs = rng.normal(0, 0.4, (f, 3, 3)).astype(np.float32)
    verts = (centers[:, None, :] + offs).reshape(-1, 3)
    return Triangles.create(verts, np.arange(3 * f).reshape(f, 3))


def _random_rays(n=700, seed=5):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Rays(o=jnp.asarray(o), d=jnp.asarray(d))


@pytest.fixture(scope="module", params=["random", "cornell"])
def case(request):
    from tpurt.core.geometry import PointLight
    from tpurt.core.scene import Scene

    if request.param == "random":
        tris = _random_scene()
        rays = _random_rays()
    else:
        scene, cam = make_cornell_box()
        tris = scene.tris
        # Irrational sub-pixel jitter keeps rays off exact triangle edges
        # (pixel centers graze the floor quad's shared diagonal, where 1-ulp
        # reassociation differences legitimately flip band acceptance).
        jitter = jnp.full((24 * 24, 2), 0.123456, jnp.float32)
        rays = gen_primary_rays(cam.replace(width=24, height=24), jitter)
        rays = Rays(o=rays.o.reshape(-1, 3), d=rays.d.reshape(-1, 3))
    scene = Scene.create(tris, PointLight.create((0, 3, 0), (1, 1, 1)))
    tracer = make_tracer(scene, method="packet")
    assert fits_vmem(tracer.packed)
    return tris, rays, tracer.packed


def test_closest_matches_packet(case):
    tris, rays, packed = case
    got = traverse_pallas(rays, tris, packed)
    ref = traverse_packet(rays, tris, packed)
    assert np.array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    # float fields agree to 1-2 ulp (scalarized MT reassociates vs jnp.cross)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.u), np.asarray(ref.u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v), np.asarray(ref.v), atol=1e-5)


def test_occluded_matches_packet(case):
    tris, rays, packed = case
    tmax = jnp.full(rays.shape, 2.5, jnp.float32)
    got = occluded_pallas(rays, tris, packed, tmax)
    ref = occluded_packet(rays, tris, packed, tmax)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("k,band", [(4, 0.0), (8, 0.15)])
def test_k_nearest_matches_packet(case, k, band):
    tris, rays, packed = case
    got = k_nearest_ids_pallas(rays, tris, packed, k=k, band=band)
    ref = k_nearest_ids_packet(rays, tris, packed, k=k, band=band)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_over_budget_falls_back(case, monkeypatch):
    """The binary engine is VMEM-resident-only: its HBM-triangle DMA tier
    was RETIRED after failing Mosaic compilation on real hardware (round-3
    on-chip parity sweep; interpret oracles cannot see Mosaic legality).
    Over budget, _plan must return None and the wrapper must fall back to
    the packet engine with identical results."""
    import tpurt.kernels.traverse as kt

    tris, rays, packed = case
    budget = kt.node_bytes(packed) + 64  # nodes fit, tris don't
    monkeypatch.setattr(kt, "VMEM_BUDGET_BYTES", budget)
    assert kt._plan(packed) is None
    got = kt.traverse_pallas(rays, tris, packed)  # logged packet fallback
    ref = traverse_packet(rays, tris, packed)
    assert np.array_equal(np.asarray(got.tri), np.asarray(ref.tri))


def test_no_bf16_tier(case, monkeypatch):
    """The bf16 node tier was REMOVED (its 2D bf16 dynamic row loads are
    Mosaic-illegal on hardware, BENCH_r02); when f32 nodes exceed the budget
    _plan must return None (-> logged packet fallback), never a bf16 plan."""
    import tpurt.kernels.traverse as kt

    tris, rays, packed = case
    monkeypatch.setattr(kt, "VMEM_BUDGET_BYTES", kt.node_bytes(packed) - 64)
    assert kt._plan(packed) is None
    got = kt.traverse_pallas(rays, tris, packed)  # falls back, still correct
    ref = traverse_packet(rays, tris, packed)
    assert np.array_equal(np.asarray(got.tri), np.asarray(ref.tri))
