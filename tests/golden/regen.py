"""Regenerate golden images (run from repo root: python tests/golden/regen.py).

Goldens are small fixed-config CPU renders with no RNG; compare with
tolerance in tests/golden/test_golden.py (SURVEY.md §4b golden images).
"""
import os, sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import conftest  # noqa: F401  (forces CPU backend, sys.path)
import numpy as np

from tpurt.core.scene import make_cornell_box, make_bunny_scene
from tpurt.render.pipeline import render

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    scene, cam = make_cornell_box()
    img = render(scene, cam.replace(width=64, height=64), method="brute")
    np.save(os.path.join(HERE, "cornell_brute_64.npy"), np.asarray(img))

    sc2, cam2 = make_bunny_scene(num_tris=3000)
    img2 = render(sc2, cam2.replace(width=48, height=48), method="packet")
    np.save(os.path.join(HERE, "bunny3k_packet_48.npy"), np.asarray(img2))

    img3 = render(scene, cam.replace(width=48, height=48), method="brute",
                  soft=True, k_layers=4, sharpness=40.0, band=0.08)
    np.save(os.path.join(HERE, "cornell_soft_48.npy"), np.asarray(img3))
    print("goldens written")


if __name__ == "__main__":
    main()
