"""Ray/tile sharding — the data-parallel axis of the renderer (SURVEY.md §2b #19).

Rays are the batch dimension of a ray tracer: every pixel is independent, so
the natural TPU mapping is a 1-D `Mesh` over all chips with the flat pixel/ray
axis sharded `P('rays')` and the scene (triangles + BVH) replicated.  All
per-ray stages (ray-gen, traversal, shading, compositing) then run without any
communication; collectives only appear at the film gather and in the gradient
all-reduce (dist/collectives.py).

The reference repo has no parallelism code to mirror (SURVEY.md §0/§2a); the
multi-chip requirement comes from BASELINE.json:5 ("shard rays/image tiles
across chips and hosts").

Numerical contract (tested in tests/dist/): a sharded render equals the
single-device render bitwise per pixel — sharding only re-tiles the batch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpurt.core.geometry import Rays
from tpurt.render.camera import gen_primary_rays
from tpurt.render.pipeline import Tracer, render_rays

Array = jax.Array

RAY_AXIS = "rays"


def make_mesh(devices=None, axis_name: str = RAY_AXIS) -> Mesh:
    """1-D device mesh over all (or the given) devices.

    Multi-host: `jax.devices()` is the global device list, so the same code
    spans hosts — tiles land on local devices, collectives ride ICI/DCN.
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def pad_rays(rays: Rays, multiple: int) -> tuple[Rays, int]:
    """Pad a flat ray batch to a multiple of `multiple` (rays that miss
    everything: zero direction never hits). Returns (padded, original_n)."""
    n = rays.shape[0]
    m = (-n) % multiple
    if m == 0:
        return rays, n
    o = jnp.concatenate([rays.o, jnp.zeros((m, 3), rays.o.dtype)])
    d = jnp.concatenate([rays.d, jnp.zeros((m, 3), rays.d.dtype)])
    return Rays(o=o, d=d), n


def shard_render_rays(
    tracer: Tracer,
    rays: Rays,
    mesh: Mesh,
    **render_kw: Any,
) -> Array:
    """Render a flat ray batch with rays sharded over the mesh.

    Scene/BVH replicated; zero collectives in the hot path.  Output colors
    come back sharded P('rays') — materializing them to the host is the film
    gather (runtime.gather_film).
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    padded, n = pad_rays(rays, ndev)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def _render(tracer_rep: Tracer, rays_shard: Rays) -> Array:
        return render_rays(tracer_rep, rays_shard, **render_kw)

    colors = _render(tracer, padded)
    return colors[:n]


def shard_render(
    tracer: Tracer,
    cam,
    mesh: Mesh,
    **render_kw: Any,
) -> Array:
    """Full-image sharded render -> (H, W, 3); rays generated then sharded."""
    rays = gen_primary_rays(cam)
    colors = shard_render_rays(tracer, rays, mesh, **render_kw)
    return colors.reshape(cam.height, cam.width, 3)


def device_put_sharded_rays(rays: Rays, mesh: Mesh) -> Rays:
    """Place a flat ray batch sharded P('rays') on the mesh (no copy churn
    when the batch is already padded to a device multiple)."""
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))
    return Rays(o=jax.device_put(rays.o, sh), d=jax.device_put(rays.d, sh))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (scene, BVH, params) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
