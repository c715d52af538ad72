"""API-level partitioned rendering (VERDICT r3 #4 / BASELINE config 5):
`Renderer(scene, mesh=..., partition='ring')` must produce the same image as
the replicated-scene render on the 8-device CPU mesh, without the caller
touching partition_scene/ring_trace."""

import jax
import numpy as np
import pytest

from tpurt.api.config import RenderConfig
from tpurt.api.renderer import Renderer
from tpurt.core.scene import make_bunny_scene, make_cornell_box
from tpurt.dist.shard import make_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(jax.devices())


def test_api_ring_matches_replicated(mesh):
    scene, cam = make_bunny_scene(num_tris=2000)
    cam = cam.replace(width=40, height=24)  # 960 rays: not divisible by 8*…
    cfg = RenderConfig(method="packet")
    img_rep = Renderer(scene, cfg).render(cam)
    img_ring = Renderer(scene, cfg, mesh=mesh, partition="ring").render(cam)
    a, b = np.asarray(img_ring), np.asarray(img_rep)
    # engines agree up to closest-hit (t, id) ties on boundary pixels
    bad = np.abs(a - b).max(-1) > 2e-3
    assert bad.mean() <= 0.003, f"{bad.sum()} pixels differ"


def test_api_auto_picks_replicated_for_small_scene(mesh):
    scene, _ = make_cornell_box()
    r = Renderer(scene, RenderConfig(method="packet"), mesh=mesh)
    assert r.partition == "replicated"


def test_api_ring_rejects_soft(mesh):
    scene, cam = make_cornell_box()
    r = Renderer(scene, RenderConfig(method="packet"), mesh=mesh,
                 partition="ring")
    with pytest.raises(ValueError, match="soft"):
        r.render(cam.replace(width=8, height=8), soft=True)


def test_api_ring_requires_mesh():
    scene, _ = make_cornell_box()
    with pytest.raises(ValueError, match="mesh"):
        Renderer(scene, RenderConfig(method="packet"), partition="ring")
