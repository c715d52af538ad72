"""Rebuild-on-drift for long fits (VERDICT r4 #8): refit-only trees degrade
as vertices move far from the topology's build positions; the fit loop
monitors an SAH-style quality ratio and rebuilds topology when it drifts."""

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.api.config import FitConfig, RenderConfig
from tpurt.api.inverse import InverseRenderer
from tpurt.core.scene import make_bunny_scene
from tpurt.render.pipeline import render


def _inv(scene, cam, **fit_kw):
    rkw = dict(method="bvh", soft=True, k_layers=2, sharpness=40.0, band=0.1)
    return InverseRenderer(
        scene, cam, fit=FitConfig(steps=1, lr=5e-3, grad_chunks=1, **fit_kw),
        render=RenderConfig(**rkw),
    ), rkw


def test_tree_quality_degrades_under_deformation_and_rebuild_restores():
    scene, cam = make_bunny_scene(num_tris=400)
    cam = cam.replace(width=8, height=8)
    inv, _ = _inv(scene, cam)
    p0 = inv.init_params()
    q0 = inv.tree_quality(p0)
    # large incoherent per-vertex displacement: destroys the Morton
    # locality the frozen topology was built around, so refit boxes
    # inflate and overlap while the root grows only modestly
    v = p0["verts"]
    noise = jax.random.uniform(
        jax.random.PRNGKey(0), v.shape, minval=-1.0, maxval=1.0
    )
    p1 = dict(p0, verts=v + 3.0 * noise)
    q1 = inv.tree_quality(p1)
    assert q1 > 1.5 * q0, (q0, q1)
    # the drift trigger fires and the rebuilt topology restores quality
    assert inv._maybe_rebuild(p1)
    assert inv.rebuilds == 1
    q2 = inv.tree_quality(p1)
    assert q2 < q1, (q1, q2)
    # and does NOT fire again right after the rebuild
    assert not inv._maybe_rebuild(p1)


def test_fit_runs_with_rebuild_checks_enabled():
    scene, cam = make_bunny_scene(num_tris=200)
    cam = cam.replace(width=8, height=8)
    inv, rkw = _inv(scene, cam, rebuild_every=2)
    target = render(scene, cam, **rkw)
    pert = scene.replace(tris=scene.tris.replace(verts=scene.tris.verts * 1.05))
    inv2 = InverseRenderer(
        pert, cam, fit=FitConfig(steps=4, lr=1e-3, rebuild_every=2),
        render=RenderConfig(method="bvh", soft=True, k_layers=2,
                            sharpness=40.0, band=0.1),
    )
    res = inv2.fit(np.asarray(target))
    assert len(res.losses) == 4 and all(np.isfinite(res.losses))
