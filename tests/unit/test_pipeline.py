"""End-to-end Cornell-box pipeline sanity (BASELINE.json:7 / SURVEY.md §4b):
the hard and soft renderers produce a sensible image, soft -> hard in the
sharp limit, and images are deterministic.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpurt.core.scene import make_cornell_box
from tpurt.render.pipeline import make_tracer, render


def small_cornell(res=48):
    scene, cam = make_cornell_box()
    cam = cam.replace(width=res, height=res)
    return scene, cam


def test_hard_render_cornell_sane():
    scene, cam = small_cornell()
    img = np.asarray(render(scene, cam, method="brute"))
    assert img.shape == (48, 48, 3)
    assert np.isfinite(img).all()
    # Most of the view hits geometry and receives some light.
    assert (img.sum(-1) > 1e-3).mean() > 0.8
    # Left wall red tint, right wall green tint (column-wise average).
    left = img[:, :6].mean((0, 1))
    right = img[:, -6:].mean((0, 1))
    assert left[0] > left[1]
    assert right[1] > right[0]


def test_shadowing_darkens_under_boxes():
    scene, cam = small_cornell()
    img = np.asarray(render(scene, cam, method="brute"))
    # Remove the boxes (keep 10 wall tris): floor brightens where shadows were.
    tris = scene.tris
    scene_nobox = scene.replace(
        tris=tris.replace(
            faces=tris.faces[:10],
            albedo=tris.albedo[:10],
            emission=tris.emission[:10],
        )
    )
    img2 = np.asarray(render(scene_nobox, cam, method="brute"))
    assert img2.sum() > img.sum()


def test_soft_matches_hard_away_from_edges():
    scene, cam = small_cornell()
    hard = np.asarray(render(scene, cam, method="brute", soft=False))
    soft = np.asarray(
        render(scene, cam, method="brute", soft=True, sharpness=3000.0, band=0.01)
    )
    diff = np.abs(hard - soft).max(-1)
    # At very high sharpness the images agree except within the tiny edge band.
    assert (diff < 3e-2).mean() > 0.93
    assert np.median(diff) < 1e-3


def test_render_is_deterministic():
    scene, cam = small_cornell(32)
    a = np.asarray(render(scene, cam, method="brute"))
    b = np.asarray(render(scene, cam, method="brute"))
    np.testing.assert_array_equal(a, b)


def test_spp_accumulation_runs():
    scene, cam = small_cornell(24)
    img = np.asarray(
        render(scene, cam, method="brute", spp=2, key=jax.random.PRNGKey(0))
    )
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
