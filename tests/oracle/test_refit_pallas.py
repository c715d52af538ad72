"""Pallas refit kernel vs the XLA reference refit (SURVEY.md §2b #8 twin).

The fused reverse-DFS sweep must reproduce accel/refit.py's level-synchronous
result bitwise on the live node prefix (same gathered corners, min/max unions
are order-independent and exact in fp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.accel.packet import max_cut_leaves, pack_bvh, refit_packed
from tpurt.accel.refit import refit_aabbs
from tpurt.core.geometry import Triangles
from tpurt.kernels.refit import refit_packed_pallas
from tpurt.render.pipeline import make_tracer
from tpurt.core.scene import make_bunny_scene, make_cornell_box


@pytest.mark.parametrize("scene_fn", [make_cornell_box,
                                      lambda: make_bunny_scene(num_tris=2000)])
def test_refit_pallas_matches_reference(scene_fn):
    scene, _ = scene_fn()
    tracer = make_tracer(scene, method="packet")
    # move the vertices, then refit both ways
    moved = scene.tris.replace(verts=scene.tris.verts * 1.07 + 0.013)

    bvh_ref = refit_aabbs(tracer.bvh, moved)
    packed_ref = refit_packed(tracer.packed, bvh_ref, moved)
    packed_pal = refit_packed_pallas(tracer.packed, moved)

    # live prefix = rows reachable from the root (trailing rows under the
    # static leaf bound are dead padding and may hold garbage)
    esc = np.asarray(tracer.packed.node_i32[:, 0])
    is_leaf = np.asarray(tracer.packed.node_i32[:, 3]) > 0
    live = np.zeros(esc.shape[0], bool)
    stack = [0]
    while stack:
        i = stack.pop()
        if i < 0 or live[i]:
            continue
        live[i] = True
        if not is_leaf[i]:
            stack.append(i + 1)
            stack.append(esc[i + 1])
        if esc[i] >= 0:
            stack.append(esc[i])

    a = np.asarray(packed_ref.node_f32)[live]
    b = np.asarray(packed_pal.node_f32)[live]
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(
        np.asarray(packed_ref.tri_rows), np.asarray(packed_pal.tri_rows)
    )
