"""API layer: Renderer façade, config system, checkpointing, inverse fit."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpurt.api.checkpoint import latest_step, restore_ckpt, save_ckpt
from tpurt.api.config import Config, RenderConfig, FitConfig, load_config
from tpurt.api.inverse import InverseRenderer
from tpurt.api.renderer import Renderer
from tpurt.core.scene import make_cornell_box
from tpurt.render.pipeline import render


@pytest.fixture(scope="module")
def cornell_small():
    scene, cam = make_cornell_box()
    return scene, cam.replace(width=32, height=32)


def test_renderer_facade_matches_pipeline(cornell_small):
    scene, cam = cornell_small
    r = Renderer(scene, RenderConfig(method="bvh"))
    img = r.render(cam)
    ref = render(scene, cam, method="bvh")
    # jit fusion may reassociate a few flops vs the eager pipeline
    assert jnp.allclose(img, ref, rtol=1e-6, atol=1e-7)


def test_renderer_spp_accumulates(cornell_small):
    scene, cam = cornell_small
    r = Renderer(scene, RenderConfig(method="bvh"))
    img = r.render(cam, spp=2, key=jax.random.key(1))
    assert img.shape == (32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_config_overrides_and_digest():
    cfg = Config()
    cfg2 = cfg.with_overrides({"render.method": "pallas", "fit.lr": "0.1"})
    assert cfg2.render.method == "pallas"
    assert cfg2.fit.lr == 0.1  # str coerced to float
    assert cfg.digest() != cfg2.digest()
    assert Config.from_dict(cfg2.to_dict()) == cfg2
    with pytest.raises(KeyError):
        cfg.with_overrides({"render.nope": 1})


def test_load_config_json(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text('{"render": {"method": "brute", "spp": 4}}')
    cfg = load_config(str(p), overrides={"render.spp": 8})
    assert cfg.render.method == "brute"
    assert cfg.render.spp == 8


def test_checkpoint_roundtrip(tmp_path):
    state = {"w": jnp.arange(6.0).reshape(2, 3), "k": jnp.int32(7)}
    save_ckpt(str(tmp_path), state, 3)
    save_ckpt(str(tmp_path), state, 10)
    assert latest_step(str(tmp_path)) == 10
    restored, step = restore_ckpt(str(tmp_path), state)
    assert step == 10
    assert jnp.array_equal(restored["w"], state["w"])
    assert restored["k"] == 7


def test_inverse_fit_albedo_recovers(cornell_small):
    """Perturb albedo, fit it back toward the target image: loss must drop
    substantially and end-state albedo must be closer than the start."""
    scene, cam = cornell_small
    target = render(scene, cam, method="bvh", soft=True, k_layers=4,
                    sharpness=40.0, band=0.15)

    perturbed = scene.replace(
        tris=scene.tris.replace(
            albedo=jnp.clip(scene.tris.albedo * 0.4 + 0.2, 0, 1)
        )
    )
    inv = InverseRenderer(
        perturbed,
        cam,
        fit=FitConfig(steps=12, lr=0.05, fit_verts=False, fit_albedo=True),
        render=RenderConfig(method="bvh", soft=True, k_layers=4,
                            sharpness=40.0, band=0.15),
    )
    res = inv.fit(target)
    assert res.losses[-1] < 0.5 * res.losses[0]
    err0 = float(jnp.mean(jnp.abs(perturbed.tris.albedo - scene.tris.albedo)))
    err1 = float(jnp.mean(jnp.abs(res.scene.tris.albedo - scene.tris.albedo)))
    assert err1 < err0


def test_inverse_fit_resume(tmp_path, cornell_small):
    scene, cam = cornell_small
    target = render(scene, cam, method="bvh", soft=True, k_layers=4,
                    sharpness=40.0, band=0.15)
    mk = lambda: InverseRenderer(
        scene, cam,
        fit=FitConfig(steps=4, lr=0.02, fit_verts=False, fit_albedo=True,
                      ckpt_every=2, ckpt_path=str(tmp_path)),
        render=RenderConfig(method="bvh", soft=True, k_layers=4,
                            sharpness=40.0, band=0.15),
    )
    mk().fit(target)
    assert latest_step(str(tmp_path)) == 4
    res2 = mk().fit(target)  # resumes at step 4 -> nothing left to do
    assert res2.steps_run == 0
