"""Structural overlap evidence for the chunked gradient all-reduce.

BASELINE.json:5 wants the grad all-reduce overlapped with backward
traversal.  True async overlap is a TPU multi-chip scheduling artifact this
environment cannot observe (the CPU mesh lowers collectives synchronously;
the single real chip has no collectives), so this test pins the STRUCTURAL
precondition in the compiled 8-device HLO instead: `chunked_grad` must emit
at least one all-reduce per chunk — independent reductions interleaved with
the remaining chunks' backward work — rather than a single fused all-reduce
after the full backward (which could never overlap anything).
"""

import jax
import jax.numpy as jnp

from tpurt.api.config import FitConfig, RenderConfig
from tpurt.api.inverse import InverseRenderer
from tpurt.core.scene import make_cornell_box
from tpurt.dist.shard import make_mesh
from tpurt.render.camera import gen_primary_rays
from tpurt.render.pipeline import render


def test_one_all_reduce_per_chunk():
    grad_chunks = 4
    scene, cam = make_cornell_box()
    cam = cam.replace(width=16, height=16)
    rkw = dict(method="bvh", soft=True, k_layers=2, sharpness=40.0, band=0.15)
    target = render(scene, cam, **rkw)
    pert = scene.replace(tris=scene.tris.replace(verts=scene.tris.verts * 1.02))
    inv = InverseRenderer(
        pert, cam,
        fit=FitConfig(steps=1, lr=1e-3, grad_chunks=grad_chunks),
        render=RenderConfig(**rkw),
        mesh=make_mesh(),
    )
    step = inv._build_step(cam.num_pixels)
    rays = gen_primary_rays(cam)
    params = inv.init_params()
    opt_state = inv.opt.init(params)
    tgt = jnp.asarray(target, jnp.float32).reshape(-1, 3)
    hlo = step.lower(
        params, opt_state, rays.o, rays.d, tgt, inv.tracer0
    ).compile().as_text()
    n_ar = sum(
        1 for line in hlo.splitlines()
        if "all-reduce" in line and "=" in line
        and "all-reduce-done" not in line  # count starts once on async backends
    )
    # >= one reduction per chunk (params may add more); a single fused
    # all-reduce would mean the chunking collapsed and nothing can overlap
    assert n_ar >= grad_chunks, f"{n_ar} all-reduces < {grad_chunks} chunks"
