"""Golden-image regression tests (SURVEY.md §4b): small fixed-config renders
vs stored arrays, tolerance-based (engines may differ on a handful of
boundary pixels; a regression flips far more). Regen: tests/golden/regen.py."""

import os

import numpy as np
import pytest

from tpurt.core.scene import make_cornell_box, make_bunny_scene
from tpurt.render.pipeline import render

HERE = os.path.dirname(os.path.abspath(__file__))


def _check(img, name, frac=0.002, atol=2e-3):
    ref = np.load(os.path.join(HERE, name))
    img = np.asarray(img)
    assert img.shape == ref.shape
    bad = np.abs(img - ref).max(axis=-1) > atol
    assert bad.mean() <= frac, f"{name}: {bad.sum()} pixels differ (>{atol})"


def test_golden_cornell_brute():
    scene, cam = make_cornell_box()
    img = render(scene, cam.replace(width=64, height=64), method="brute")
    _check(img, "cornell_brute_64.npy", frac=0.0)


@pytest.mark.parametrize("method", ["bvh", "packet", "pallas", "pallas8"])
def test_golden_cornell_engines(method):
    """Every engine must reproduce the brute golden up to boundary pixels."""
    scene, cam = make_cornell_box()
    img = render(scene, cam.replace(width=64, height=64), method=method)
    _check(img, "cornell_brute_64.npy", frac=0.003)


def test_golden_bunny_packet():
    sc, cam = make_bunny_scene(num_tris=3000)
    img = render(sc, cam.replace(width=48, height=48), method="packet")
    _check(img, "bunny3k_packet_48.npy", frac=0.0)


def test_golden_cornell_soft():
    scene, cam = make_cornell_box()
    img = render(scene, cam.replace(width=48, height=48), method="brute",
                 soft=True, k_layers=4, sharpness=40.0, band=0.08)
    _check(img, "cornell_soft_48.npy", frac=0.0)


@pytest.mark.parametrize("method", [
    "bvh", "packet",
    pytest.param("pallas8", marks=pytest.mark.slow),
])
def test_golden_cornell_soft_engines(method):
    """The SOFT render through the production engines (band-inflated BVH +
    k-nearest candidates) against the brute soft golden — a regression in
    the engine k-nearest -> compositing chain flips this even though the
    hard goldens stay green (VERDICT r4 weak #3)."""
    scene, cam = make_cornell_box()
    img = render(scene, cam.replace(width=48, height=48), method=method,
                 soft=True, k_layers=4, sharpness=40.0, band=0.08)
    _check(img, "cornell_soft_48.npy", frac=0.003)
