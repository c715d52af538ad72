"""Inverse renderer: fit vertices/albedo to target images (SURVEY.md §2b #24).

The flagship "training" loop (BASELINE.json:10): differentiable soft render ->
pixel L2 loss -> jax.grad -> optax update, with

- BVH **refit** (not rebuild) inside the jitted step — topology and Morton
  order are frozen from the initial geometry, node AABBs track the moving
  vertices (accel/refit.py); AABBs are stop-gradient (they only gate which
  triangles traversal finds, and gradients flow through the recomputed
  hit attributes, render/pipeline.py).
- Data parallelism over rays: the step body runs under shard_map with rays
  and targets P('rays'), params replicated, per-chunk grad psum overlapped
  with remaining backward traversal (dist/collectives.chunked_grad,
  BASELINE.json:5).
- Checkpoint every K steps with resume-from-latest (api/checkpoint.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpurt.accel.refit import refit_aabbs
from tpurt.api.checkpoint import latest_step, restore_ckpt, save_ckpt
from tpurt.api.config import FitConfig, RenderConfig
from tpurt.core.geometry import Camera, Rays
from tpurt.core.scene import Scene
from tpurt.dist.collectives import chunked_grad
from tpurt.render.camera import gen_primary_rays
from tpurt.render.pipeline import Tracer, make_tracer, render_rays, tri_table

Array = jax.Array


def _make_optimizer(cfg: FitConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adam":
        return optax.adam(cfg.lr)
    if cfg.optimizer == "sgd":
        return optax.sgd(cfg.lr)
    raise ValueError(f"unknown optimizer {cfg.optimizer!r}")


class InverseRenderer:
    """Fit scene parameters so the rendered image matches target image(s).

    >>> inv = InverseRenderer(init_scene, cam, fit=FitConfig(steps=300))
    >>> result = inv.fit(target_image)
    >>> result.scene          # optimized geometry/materials
    >>> result.losses         # per-step loss history
    """

    def __init__(
        self,
        scene: Scene,
        cam: Camera,
        fit: FitConfig | None = None,
        render: RenderConfig | None = None,
        mesh=None,
    ):
        self.fit_cfg = fit or FitConfig()
        self.render_cfg = render or RenderConfig(
            method="bvh", soft=True, k_layers=6, sharpness=40.0, band=0.15
        )
        if not self.render_cfg.soft:
            raise ValueError("inverse rendering requires RenderConfig(soft=True)")
        self.scene0 = scene
        self.cam = cam
        self.mesh = mesh
        self.tracer0 = make_tracer(scene, **self.render_cfg.tracer_kwargs())
        self.opt = _make_optimizer(self.fit_cfg)
        self._step_fn = None
        self.rebuilds = 0
        self._quality0 = None  # at-build quality, computed lazily

    # -- parameter pytree -------------------------------------------------
    def init_params(self) -> dict[str, Array]:
        p: dict[str, Array] = {}
        if self.fit_cfg.fit_verts:
            p["verts"] = self.scene0.tris.verts
        if self.fit_cfg.fit_albedo:
            p["albedo"] = self.scene0.tris.albedo
        if not p:
            raise ValueError("nothing to fit: enable fit_verts or fit_albedo")
        return p

    def apply_params(self, params: dict[str, Array]) -> Scene:
        tris = self.scene0.tris
        if "verts" in params:
            tris = tris.replace(verts=params["verts"])
        if "albedo" in params:
            tris = tris.replace(albedo=jnp.clip(params["albedo"], 0.0, 1.0))
        return self.scene0.replace(tris=tris)

    # -- one jitted step ---------------------------------------------------
    def _build_step(self, n_rays_padded: int):
        cfg = self.fit_cfg
        rkw = self.render_cfg.render_kwargs()
        axis = self.mesh.axis_names[0] if self.mesh is not None else None

        def loss_fn(params, o, d, target, tracer):
            scene = self.apply_params(params)
            # table must track the step's parameters (differentiably) —
            # one fused corner gather + segment-sum per chunk
            tr = tracer.replace(scene=scene, table=tri_table(scene.tris))
            colors = render_rays(tr, Rays(o=o, d=d), **rkw)
            return jnp.sum((colors - target) ** 2)

        def grads_body(params, o, d, target, tracer0):
            # Refit once per step with the current vertices; AABBs carry no
            # gradient (discrete structure only).  tracer0 is a step ARG
            # (not a closure constant) so a rebuild-on-drift swap
            # (self._maybe_rebuild) needs no re-jit and no re-embedding of
            # the whole BVH as HLO constants.
            scene = jax.lax.stop_gradient(self.apply_params(params))
            bvh = tracer0.bvh
            packed = tracer0.packed
            wide = tracer0.wide
            if bvh is not None and "verts" in params:
                # flat arrays feed only the binary engines; skip their
                # scatter rewrite on the BVH8/brute paths (refit.py)
                needs_flat = self.render_cfg.method in (
                    "bvh", "wave", "packet", "pallas")
                if wide is not None and packed is None and not needs_flat:
                    # pure-BVH8 path: fold boxes up the wide topology
                    # directly (refit_wide_direct) — skips the binary
                    # node RMQ entirely; one stop-grad table build buys
                    # the ~3x cheaper rows_from_table repack.  The step's
                    # bvh keeps stale boxes — nothing on this path reads
                    # them (tree_quality recomputes its own).
                    from tpurt.accel.bvh8 import refit_wide_direct

                    wide = refit_wide_direct(wide, scene.tris,
                                             table=tri_table(scene.tris))
                else:
                    bvh = refit_aabbs(bvh, scene.tris,
                                      update_flat=needs_flat)
                    if packed is not None:
                        from tpurt.accel.packet import refit_packed

                        packed = refit_packed(packed, bvh, scene.tris)
                    if wide is not None:
                        from tpurt.accel.bvh8 import refit_wide

                        wide = refit_wide(wide, bvh, scene.tris,
                                          table=tri_table(scene.tris))
            tracer = tracer0.replace(
                scene=scene, bvh=bvh, packed=packed, wide=wide
            )
            return chunked_grad(
                functools.partial(loss_fn, tracer=tracer),
                params,
                (o, d, target),
                n_chunks=cfg.grad_chunks,
                axis_name=axis,
            )

        if self.mesh is not None:
            grads_body = shard_map(
                grads_body,
                mesh=self.mesh,
                in_specs=(P(), P(axis), P(axis), P(axis), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )

        @jax.jit
        def step(params, opt_state, o, d, target, tracer0):
            loss, grads = grads_body(params, o, d, target, tracer0)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    # -- rebuild-on-drift --------------------------------------------------
    def tree_quality(self, params: dict[str, Array]) -> float:
        """SAH-style tree quality of the (refit) BVH at these vertices:
        sum of internal-node surface areas / root surface area — the
        expected number of node tests per random ray, up to a constant.
        Refit-only fits degrade this as vertices drift far from the
        topology's build positions (boxes inflate and overlap); the ratio
        against the at-build value is the rebuild trigger."""
        from tpurt.accel.lbvh import range_minmax_sparse

        scene = self.apply_params(params)
        bvh = self.tracer0.bvh
        if bvh is None:
            return 1.0
        v0, v1, v2 = scene.tris.corners()
        tri_lo = jnp.minimum(jnp.minimum(v0, v1), v2)
        tri_hi = jnp.maximum(jnp.maximum(v0, v1), v2)
        lo, hi = range_minmax_sparse(
            tri_lo[bvh.tri_order], tri_hi[bvh.tri_order], bvh.first, bvh.last
        )
        d = jnp.maximum(hi - lo, 0.0)
        area = 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                      + d[:, 2] * d[:, 0])
        return float(jnp.sum(area) / jnp.maximum(area[0], 1e-30))

    def _maybe_rebuild(self, params: dict[str, Array]) -> bool:
        """Rebuild the acceleration structure from scratch at the current
        vertices when refit quality has degraded past
        fit_cfg.rebuild_ratio x the at-build quality (VERDICT r4 #8).
        Topology/morton order re-freeze at the new geometry; the jitted
        step takes the tracer as an argument, so no recompile happens."""
        if self._quality0 is None:
            self._quality0 = self.tree_quality(self.init_params())
        q = self.tree_quality(params)
        if q <= self.fit_cfg.rebuild_ratio * self._quality0:
            return False
        self.tracer0 = make_tracer(
            self.apply_params(params), **self.render_cfg.tracer_kwargs()
        )
        self._quality0 = self.tree_quality(params)
        self.rebuilds += 1
        return True

    # -- driver loop -------------------------------------------------------
    def fit(
        self,
        target_image: Array,
        steps: int | None = None,
        callback: Callable[[int, float], None] | None = None,
    ) -> "FitResult":
        cfg = self.fit_cfg
        steps = cfg.steps if steps is None else steps

        rays = gen_primary_rays(self.cam)
        target = jnp.asarray(target_image, jnp.float32).reshape(-1, 3)
        # Pad rays+targets so (devices * chunks) divides the batch. Padded
        # targets are black and padded rays have zero direction -> they render
        # background==0 contribution is constant, gradient-free.
        mult = cfg.grad_chunks * (self.mesh.devices.size if self.mesh is not None else 1)
        n = rays.shape[0]
        pad = (-n) % mult
        if pad:
            zeros = jnp.zeros((pad, 3), jnp.float32)
            rays = Rays(
                o=jnp.concatenate([rays.o, zeros]),
                d=jnp.concatenate([rays.d, zeros]),
            )
            target = jnp.concatenate([target, zeros])

        params = self.init_params()
        opt_state = self.opt.init(params)
        start = 0
        if cfg.ckpt_path and latest_step(cfg.ckpt_path) is not None:
            (params, opt_state), start = restore_ckpt(
                cfg.ckpt_path, (params, opt_state)
            )

        step = self._build_step(rays.shape[0])
        losses = []
        for i in range(start, steps):
            params, opt_state, loss = step(
                params, opt_state, rays.o, rays.d, target, self.tracer0
            )
            losses.append(float(loss) / n)
            if callback:
                callback(i, losses[-1])
            if (cfg.rebuild_every and "verts" in params
                    and (i + 1) % cfg.rebuild_every == 0):
                self._maybe_rebuild(params)
            if cfg.ckpt_path and cfg.ckpt_every and (i + 1) % cfg.ckpt_every == 0:
                save_ckpt(cfg.ckpt_path, (params, opt_state), i + 1)

        return FitResult(
            scene=self.apply_params(params),
            params=params,
            losses=losses,
            steps_run=steps - start,
        )


class FitResult:
    def __init__(self, scene: Scene, params: dict, losses: list, steps_run: int):
        self.scene = scene
        self.params = params
        self.losses = losses
        self.steps_run = steps_run
