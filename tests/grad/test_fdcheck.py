"""Gradient acceptance gate (BASELINE.json:2): jax.grad of the soft renderer
matches central finite differences for d(loss)/d(vertices) and d(loss)/d(albedo),
including silhouette-crossing configurations (SURVEY.md §4b 'Gradient').

Scenes are put in *generic position* (small deterministic vertex jitter,
off-axis light): the axis-aligned Cornell box otherwise places entire faces
exactly on max(n·l, 0) / min-barycentric kinks, where no implementation's
one-sided derivative can match a symmetric difference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.core.geometry import PointLight, Rays, Triangles
from tpurt.core.scene import Scene, make_cornell_box
from tpurt.diff.fdcheck import check_grads_fd
from tpurt.render.pipeline import make_tracer, render, render_rays

# k_layers=8: enough layers that no significant-alpha hit is ever truncated in
# the Cornell box (truncating a visible layer is a forward discontinuity).
# sharpness=30: silhouette feature width ~1/30 in barycentric units keeps the
# curvature within reach of Richardson-extrapolated finite differences.
SOFT = dict(soft=True, sharpness=30.0, band=0.25, k_layers=8)


def generic_cornell(res=24):
    scene, cam = make_cornell_box()
    jit = jax.random.uniform(
        jax.random.PRNGKey(9), scene.tris.verts.shape, minval=-0.015, maxval=0.015
    )
    scene = scene.replace(
        tris=scene.tris.replace(verts=scene.tris.verts + jit),
        lights=PointLight.create((0.43, 0.91, 0.56), (14.0,) * 3),
    )
    return scene, cam.replace(width=res, height=res)


def test_silhouette_gradient_single_triangle():
    """Rays that *miss* a triangle near its edge must still see gradients
    (the classic silhouette term a hard renderer loses entirely)."""
    lights = PointLight.create((0.1, 0.2, 5.0), (60.0,) * 3)

    def loss(verts):
        tris = Triangles.create(verts, [[0, 1, 2]], albedo=(0.8, 0.2, 0.2))
        scene = Scene.create(tris, lights, background=(0.0, 0.0, 0.0))
        tracer = make_tracer(scene, "brute")
        # A ray slightly OUTSIDE the edge u=0 (x<0 side of the triangle).
        rays = Rays(
            o=jnp.array([[-0.05, 0.3, 2.0]]), d=jnp.array([[0.0, 0.0, -1.0]])
        )
        img = render_rays(tracer, rays, **SOFT)
        return jnp.sum(img)

    verts0 = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    g = jax.grad(loss)(verts0)
    # Moving v0.x toward the ray increases coverage -> nonzero silhouette grad.
    assert float(jnp.abs(g).sum()) > 1e-4
    check_grads_fd(loss, verts0, eps=1e-3, rtol=6e-2, atol=2e-3,
                   max_probes_per_leaf=9)


def test_cornell_vertex_and_albedo_grads_match_fd():
    scene0, cam = generic_cornell()
    w = jax.random.uniform(
        jax.random.PRNGKey(3), (24, 24, 3), minval=0.2, maxval=1.0
    )

    def loss(params):
        verts, albedo = params
        scene = scene0.replace(
            tris=scene0.tris.replace(verts=verts, albedo=albedo)
        )
        img = render(scene, cam, method="brute", **SOFT)
        return jnp.mean(w * img)

    params = (scene0.tris.verts, scene0.tris.albedo)
    g = jax.jit(jax.grad(loss))(params)
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g)
    )
    report = check_grads_fd(
        loss, params, eps=1e-3, rtol=6e-2, atol=2e-3, max_probes_per_leaf=16,
        seed=1,
    )
    assert report["ok"]
    assert report["n_probes"] >= 32


def _engine_loss(method, res=16):
    """Loss through the PRODUCTION engine path: band-inflated BVH built once,
    refit (not rebuilt) inside the loss exactly like api/inverse.py's step.

    This is the gate VERDICT r4 flagged as brute-only: the engine candidate
    set changes at the band-inflated box boundary, where the compact-support
    coverage window (diff/softvis.coverage) now guarantees alpha == 0, so the
    forward model is C^1 on the engine path too."""
    from tpurt.accel.refit import refit_aabbs
    from tpurt.render.pipeline import tri_table

    scene0, cam = generic_cornell(res)
    w = jax.random.uniform(
        jax.random.PRNGKey(3), (res, res, 3), minval=0.2, maxval=1.0
    )
    tracer0 = make_tracer(scene0, method, band=SOFT["band"])

    def loss(params):
        verts, albedo = params
        tris = scene0.tris.replace(verts=verts, albedo=albedo)
        scene = scene0.replace(tris=tris)
        stris = jax.lax.stop_gradient(tris)
        bvh = refit_aabbs(
            tracer0.bvh, stris,
            update_flat=method in ("bvh", "wave", "packet", "pallas"),
        )
        wide = tracer0.wide
        if wide is not None:
            from tpurt.accel.bvh8 import refit_wide

            wide = refit_wide(wide, bvh, stris)
        packed = tracer0.packed
        if packed is not None:
            from tpurt.accel.packet import refit_packed

            packed = refit_packed(packed, bvh, stris)
        tracer = tracer0.replace(
            scene=scene, bvh=bvh, wide=wide, packed=packed,
            table=tri_table(tris),
        )
        img = render(scene, cam, tracer=tracer, **SOFT)
        return jnp.mean(w * img)

    return loss, (scene0.tris.verts, scene0.tris.albedo)


@pytest.mark.parametrize("method", [
    "bvh", "packet",
    # the Pallas engine runs these in interpret mode on CPU: same ids/math,
    # but its fwd+grad COMPILE alone is ~450 s -> slow tier
    pytest.param("pallas8", marks=pytest.mark.slow),
])
def test_engine_path_grads_match_fd(method):
    """The allclose acceptance gate (BASELINE.json:2) on the paths users
    actually run — not just the brute oracle (VERDICT r4 missing #2)."""
    loss, params = _engine_loss(method)
    g = jax.jit(jax.grad(loss))(params)
    assert all(
        np.isfinite(np.asarray(x)).all() for x in jax.tree_util.tree_leaves(g)
    )
    report = check_grads_fd(
        loss, params, eps=1e-3, rtol=6e-2, atol=2e-3,
        max_probes_per_leaf=8, seed=1,
    )
    assert report["ok"]


@pytest.mark.parametrize("method", [
    "packet", pytest.param("pallas8", marks=pytest.mark.slow),
])
def test_engine_matches_brute_soft_image(method):
    """The soft forward image itself must be engine-independent (same
    candidate sets up to band-boundary alphas, which are now exactly 0)."""
    scene0, cam = generic_cornell(16)
    img_b = render(scene0, cam, method="brute", **SOFT)
    img_e = render(scene0, cam, method=method, **SOFT)
    np.testing.assert_allclose(
        np.asarray(img_e), np.asarray(img_b), rtol=2e-3, atol=2e-3
    )


def test_albedo_gradient_sign():
    """Brightening a lit face's albedo increases image sum; grad must be >= 0
    for all albedo channels (Lambertian is monotone in albedo)."""
    scene0, cam = generic_cornell(16)

    def loss(albedo):
        scene = scene0.replace(tris=scene0.tris.replace(albedo=albedo))
        return jnp.sum(render(scene, cam, method="brute", **SOFT))

    g = np.asarray(jax.grad(loss)(scene0.tris.albedo))
    assert (g >= -1e-6).all()
    assert g.max() > 0.0
