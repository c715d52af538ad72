"""Renderer façade: scene in -> image out (SURVEY.md §2b #25).

Wraps tracer construction, jit caching, and optional multi-chip sharding
behind one object so users never touch shard_map or BVH plumbing.  The
reference has no API surface to mirror (SURVEY.md §0).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from tpurt.api.config import RenderConfig
from tpurt.core.geometry import Camera, Rays
from tpurt.core.scene import Scene
from tpurt.render.camera import gen_primary_rays
from tpurt.render.pipeline import Tracer, make_tracer, render_rays


class Renderer:
    """Stateful façade: holds the scene, its acceleration structure, and the
    compiled render function.

    >>> r = Renderer(scene, config=RenderConfig(method='bvh'))
    >>> img = r.render(cam)                   # (H, W, 3) linear radiance
    >>> img = r.render(cam, spp=16, key=key)  # jittered AA
    """

    # scenes at/above this size default to the partitioned ring on a mesh
    # (BASELINE config 5: 5M tris cannot be replicated per chip at pod scale)
    AUTO_PARTITION_TRIS = 2_000_000

    def __init__(
        self,
        scene: Scene,
        config: RenderConfig | None = None,
        mesh=None,
        partition: str = "auto",
    ):
        """partition (with a mesh): 'replicated' shards rays over the mesh
        against a replicated scene+BVH; 'ring' Morton-partitions the scene
        across the mesh and rotates ray blocks around it (dist/ring.py —
        hard rendering only); 'auto' picks 'ring' for scenes too large to
        replicate (>= AUTO_PARTITION_TRIS), else 'replicated'."""
        self.config = config or RenderConfig()
        self.mesh = mesh
        self.scene = scene
        if partition not in ("auto", "replicated", "ring"):
            raise ValueError(partition)
        if partition == "auto":
            partition = (
                "ring"
                if mesh is not None
                and scene.tris.num_tris >= self.AUTO_PARTITION_TRIS
                else "replicated"
            )
        if partition == "ring" and mesh is None:
            raise ValueError("partition='ring' requires a mesh")
        self.partition = partition
        kw = self.config.tracer_kwargs()
        if partition == "ring":
            kw["method"] = "ring"
            kw["mesh"] = mesh
        self._tracer = make_tracer(scene, **kw)
        self._compiled: dict[Any, Any] = {}

    @property
    def tracer(self) -> Tracer:
        return self._tracer

    def update_scene(self, scene: Scene, rebuild_bvh: bool = True) -> None:
        """Swap scene; rebuild_bvh=False keeps topology (vertex-only edits
        still need a refit — use InverseRenderer for that loop).

        On a ring-partitioned Renderer the triangle geometry is baked into
        the per-partition BVHs and there is no refit path, so keeping the
        old partition while swapping shading would silently render stale
        geometry (ADVICE r4) — the partition is always rebuilt there."""
        from tpurt.render.pipeline import tri_table

        self.scene = scene
        kw = self.config.tracer_kwargs()
        if self.partition == "ring":
            kw["method"] = "ring"
            kw["mesh"] = self.mesh
        if rebuild_bvh or self.partition == "ring" or self._tracer.bvh is None:
            self._tracer = make_tracer(scene, **kw)
        else:
            self._tracer = self._tracer.replace(
                scene=scene, table=tri_table(scene.tris))

    # -- rendering --------------------------------------------------------
    def render_rays(self, rays: Rays, **overrides: Any) -> jax.Array:
        kw = {**self.config.render_kwargs(), **overrides}
        # the sampler key is an array (unhashable): keep it out of the jit
        # cache key and pass it as a traced call argument instead
        key = kw.pop("key", None)
        if kw.get("light_samples", 0) > 0 and key is None:
            key = jax.random.key(self.config.light_seed)
        if self.mesh is not None:
            if self.partition == "ring":
                # the ring engine shards rays + scene internally
                # (jit+shard_map inside dist/ring.py); no outer wrapper.
                # Soft/differentiable rendering works here too since round
                # 5 (dist/ring.ring_k_nearest feeds the stop-grad soft
                # model with partitioned candidates).
                return render_rays(self._tracer, rays, key=key, **kw)
            from tpurt.dist.shard import shard_render_rays

            return shard_render_rays(self._tracer, rays, self.mesh, key=key,
                                     **kw)
        fn = self._render_jit(tuple(sorted(kw.items())))
        if key is None:
            key = jax.random.key(0)  # unused when light_samples == 0
        return fn(self._tracer, rays, key)

    def render(
        self,
        cam: Camera,
        spp: int = None,
        key: jax.Array | None = None,
        **overrides: Any,
    ) -> jax.Array:
        spp = self.config.spp if spp is None else spp
        if spp > 1 and key is None:
            key = jax.random.key(0)
        if spp > 1:
            from tpurt.core.math import sample_square

            keys = jax.random.split(key, spp)
            acc = jnp.zeros((cam.num_pixels, 3))
            for k in keys:  # python loop: each sample reuses the jit cache
                jitter = sample_square(k, (cam.num_pixels,))
                acc = acc + self.render_rays(gen_primary_rays(cam, jitter), **overrides)
            return (acc / spp).reshape(cam.height, cam.width, 3)
        colors = self.render_rays(gen_primary_rays(cam), **overrides)
        return colors.reshape(cam.height, cam.width, 3)

    # -- jit cache ---------------------------------------------------------
    def _render_jit(self, kw_key):
        fn = self._compiled.get(kw_key)
        if fn is None:
            kw = dict(kw_key)
            fn = jax.jit(
                lambda tracer, rays, key: render_rays(tracer, rays, key=key,
                                                      **kw),
            )
            self._compiled[kw_key] = fn
        return fn
