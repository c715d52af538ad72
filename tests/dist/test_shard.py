"""Sharded rendering and gradients vs single-device ground truth.

Runs on the 8-virtual-device CPU mesh (root conftest.py). Contract
(SURVEY.md §4b): sharding only re-tiles the ray batch — a sharded render is
bitwise equal per pixel, and psum'd DP gradients match the global gradient.
"""

import jax
import jax.numpy as jnp
import pytest

from tpurt.core.scene import make_cornell_box
from tpurt.dist.collectives import chunked_grad
from tpurt.dist.shard import make_mesh, shard_render, shard_render_rays
from tpurt.render.camera import gen_primary_rays
from tpurt.render.pipeline import make_tracer, render, render_rays


@pytest.fixture(scope="module")
def cornell():
    scene, cam = make_cornell_box()
    return scene, cam.replace(width=40, height=40)


def test_mesh_spans_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == jax.device_count() == 8


def test_shard_render_matches_single_device(cornell):
    scene, cam = cornell
    mesh = make_mesh()
    tracer = make_tracer(scene, "bvh")
    ref = render(scene, cam, tracer=tracer)
    img = shard_render(tracer, cam, mesh)
    assert img.shape == ref.shape
    assert jnp.array_equal(img, ref), "sharded render must be bitwise equal"


def test_shard_render_pads_ragged_batches(cornell):
    scene, cam = cornell
    mesh = make_mesh()
    tracer = make_tracer(scene, "bvh")
    rays = gen_primary_rays(cam)
    # 1201 rays: not divisible by 8 -> exercises pad_rays
    ragged = jax.tree_util.tree_map(lambda x: x[:1201], rays)
    ref = render_rays(tracer, ragged)
    out = shard_render_rays(tracer, ragged, mesh)
    assert out.shape == (1201, 3)
    assert jnp.array_equal(out, ref)


def test_soft_shard_render_matches(cornell):
    scene, cam = cornell
    mesh = make_mesh()
    kw = dict(soft=True, k_layers=4, sharpness=40.0, band=0.15)
    tracer = make_tracer(scene, "bvh", band=kw["band"])
    ref = render(scene, cam, tracer=tracer, **kw)
    img = shard_render(tracer, cam, mesh, **kw)
    assert jnp.allclose(img, ref, atol=1e-6)


def test_chunked_grad_matches_plain_grad(cornell):
    scene, cam = cornell
    tracer = make_tracer(scene, "bvh", band=0.15)
    rays = gen_primary_rays(cam)
    target = jnp.zeros((rays.shape[0], 3))

    def loss(verts, o, d, tgt):
        sc = scene.replace(tris=scene.tris.replace(verts=verts))
        tr = tracer.replace(scene=sc)
        colors = render_rays(
            tr, type(rays)(o=o, d=d), soft=True, k_layers=4,
            sharpness=40.0, band=0.15,
        )
        return jnp.sum((colors - tgt) ** 2)

    ref_l, ref_g = jax.value_and_grad(loss)(
        scene.tris.verts, rays.o, rays.d, target
    )
    l4, g4 = chunked_grad(
        loss, scene.tris.verts, (rays.o, rays.d, target), n_chunks=4
    )
    assert jnp.allclose(l4, ref_l, rtol=1e-5)
    assert jnp.allclose(g4, ref_g, rtol=1e-4, atol=1e-6)
