"""Data-parallel inverse rendering: sharded fit step == single-device step."""

import jax
import jax.numpy as jnp
import pytest

from tpurt.api.config import FitConfig, RenderConfig
from tpurt.api.inverse import InverseRenderer
from tpurt.core.scene import make_cornell_box
from tpurt.dist.shard import make_mesh
from tpurt.render.pipeline import render

RKW = dict(method="bvh", soft=True, k_layers=4, sharpness=40.0, band=0.15)


@pytest.fixture(scope="module")
def problem():
    scene, cam = make_cornell_box()
    cam = cam.replace(width=32, height=32)
    target = render(scene, cam, **{k: v for k, v in RKW.items()})
    perturbed = scene.replace(
        tris=scene.tris.replace(verts=scene.tris.verts * 1.02)
    )
    return perturbed, cam, target


def _fit(scene, cam, target, mesh, chunks, steps=2):
    inv = InverseRenderer(
        scene, cam,
        fit=FitConfig(steps=steps, lr=1e-3, fit_verts=True, fit_albedo=True,
                      grad_chunks=chunks),
        render=RenderConfig(**RKW),
        mesh=mesh,
    )
    return inv.fit(target)


def test_dp_fit_matches_single_device(problem):
    scene, cam, target = problem
    res1 = _fit(scene, cam, target, mesh=None, chunks=1)
    res8 = _fit(scene, cam, target, mesh=make_mesh(), chunks=2)
    # Same loss trajectory and same parameters up to reduction-order noise.
    assert jnp.allclose(
        jnp.asarray(res1.losses), jnp.asarray(res8.losses), rtol=1e-4
    )
    assert jnp.allclose(
        res1.params["verts"], res8.params["verts"], rtol=1e-4, atol=1e-6
    )


def test_dp_fit_makes_progress(problem):
    scene, cam, target = problem
    res = _fit(scene, cam, target, mesh=make_mesh(), chunks=2, steps=6)
    assert res.losses[-1] < res.losses[0]
