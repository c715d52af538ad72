"""Render pipeline: primary rays -> hits -> shadow rays -> shade -> film.

SURVEY.md §2b #14.  One jittable function over SoA ray batches; every stage is
dense vector math so XLA fuses ray-gen, shading and compositing around the
traversal core.  Traversal is pluggable via `Tracer` (brute-force oracle,
pure-JAX LBVH, or Pallas TPU kernels) — gradients are *independent* of the
traversal engine because hit attributes (t,u,v) are always recomputed
differentiably from the discrete hit ids (stop-gradient on ids only).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from tpurt.accel.intersect import (
    DEFAULT_T_MIN,
    DET_EPS,
    intersect_brute,
    intersect_tri,
    occluded_brute,
)
from tpurt.core.geometry import Hit, KHits, Rays
from tpurt.core.scene import Scene
from tpurt.core.math import sample_square
from tpurt.diff.intersect_vjp import intersect_tuv
from tpurt.diff.gather_grad import gather_verts
from tpurt.diff.softvis import (
    composite,
    coverage,
    det_gate,
    k_nearest_brute,
    soft_occlusion_layers,
)
from tpurt.render.camera import gen_primary_rays
from tpurt.render.shade import (
    area_light_contrib,
    face_forward,
    light_dirs,
    sample_emitters,
    shade_lambert,
)

Array = jax.Array

SHADOW_EPS = 1e-3  # offset shadow-ray origins off the surface
SHADOW_T_FRAC = 1.0 - 1e-3  # stop shadow rays just before the light


def tri_table(tris) -> Array:
    """Packed per-triangle shading/geometry table, (T, 15) f32:
    [v0 (3), e1 (3), e2 (3), albedo (3), emission (3)].

    Why: XLA row gathers cost ~10 ns/row on v5e regardless of width
    (measured, docs/PERF.md round 4), so per-hit attribute fetches dominate
    both renders once traversal is fast — the round-3 pipeline issued SIX
    gathers per (ray, layer): faces, three corners, albedo, emission
    (~8M rows = ~80 ms of a 152 ms hard 1080p frame).  Everything downstream
    now gathers ONE table row per (ray, layer/candidate).

    Differentiable: built through the fused segment-sum corner gather, so
    d(table)/d(verts, albedo) is one sorted segment-sum per step.  Contract:
    the table must be rebuilt whenever scene.tris changes (render() and the
    fit/bench steps do; make_tracer builds the static-scene one eagerly).
    """
    from tpurt.diff.gather_grad import gather_verts as _gv

    v = _gv(tris.verts, tris.faces)          # (T, 3 corners, 3)
    v0 = v[:, 0]
    return jnp.concatenate(
        [v0, v[:, 1] - v0, v[:, 2] - v0, tris.albedo, tris.emission], axis=-1
    )


class Tracer(struct.PyTreeNode):
    """Traversal engine bound to a scene.

    method (static): 'brute' | 'bvh' | 'packet' | 'wave' | 'pallas' |
    'pallas8' | 'ring'.
    - 'brute':  O(R*T) oracle (accel/intersect.py).
    - 'bvh':    per-ray pure-JAX LBVH traversal (accel/traverse_ref.py) —
                CPU oracle; per-ray node gathers blow up on TPU.
    - 'packet': scalar-cursor packet traversal (accel/packet.py); `packed`
                carries its layout.
    - 'wave':   lockstep wavefront traversal (accel/wavefront.py) — the
                TPU-fast engine (bulk gathers, one global while loop).
    - 'pallas': binary-BVH Pallas kernels (kernels/traverse.py).
    - 'pallas8': 8-wide BVH Pallas kernels (kernels/traverse8.py) — the
                production TPU engine; `wide` carries its layout.
    - 'ring':   scene PARTITIONED across a device mesh, ray blocks rotated
                around the ring (dist/ring.py; BASELINE config 5).  `part`
                carries the Morton partition, `pbvh` the per-partition
                structures (stacked WideBVHs for the production BVH8
                kernel, or packed binary BVHs — make_tracer ring_engine),
                `mesh` (static) the jax.sharding.Mesh.  Hard AND
                soft/differentiable rendering (ring_k_nearest rotates the
                per-ray candidate lists; the table stays replicated).
    """

    scene: Scene
    bvh: Any = None
    packed: Any = None
    wide: Any = None
    # packed (T, 15) attribute table (tri_table); MUST track scene.tris —
    # rebuild via tracer.replace(scene=sc, table=tri_table(sc.tris))
    table: Any = None
    # 'ring' engine state (dist/): Morton ScenePartition, per-partition
    # packed BVHs, and the device mesh the ring rotates over
    part: Any = None
    pbvh: Any = None
    mesh: Any = struct.field(pytree_node=False, default=None)
    method: str = struct.field(pytree_node=False, default="brute")

    def _ring_pad(self, rays: Rays, *extra):
        n_dev = self.mesh.devices.size
        o = rays.o.reshape(-1, 3)
        d = rays.d.reshape(-1, 3)
        n = o.shape[0]
        pad = (-n) % n_dev
        if pad:
            o = jnp.pad(o, ((0, pad), (0, 0)))
            d = jnp.pad(d, ((0, pad), (0, 0)))
            extra = tuple(jnp.pad(e.reshape(-1), (0, pad)) for e in extra)
        else:
            extra = tuple(e.reshape(-1) for e in extra)
        return Rays(o=o, d=d), n, extra

    # -- closest hit ------------------------------------------------------
    def closest(self, rays: Rays) -> Hit:
        if self.method == "brute":
            return intersect_brute(rays, self.scene.tris)
        if self.method == "bvh":
            from tpurt.accel.traverse_ref import traverse_ref

            return traverse_ref(rays, self.scene.tris, self.bvh)
        if self.method == "packet":
            from tpurt.accel.packet import traverse_packet

            return traverse_packet(rays, self.scene.tris, self.packed)
        if self.method == "wave":
            from tpurt.accel.wavefront import wave_closest

            return wave_closest(rays, self.scene.tris, self.bvh)
        if self.method == "pallas":
            from tpurt.kernels.traverse import traverse_pallas

            return traverse_pallas(rays, self.scene.tris, self.packed)
        if self.method == "pallas8":
            from tpurt.kernels.traverse8 import traverse_pallas8

            return traverse_pallas8(rays, self.scene.tris, self.wide)
        if self.method == "ring":
            from tpurt.dist.ring import ring_trace

            shape = rays.shape
            flat, n, _ = self._ring_pad(rays)
            hit = ring_trace(self.mesh, flat, self.part, pbvh=self.pbvh)
            return Hit(
                t=hit.t[:n].reshape(shape), u=hit.u[:n].reshape(shape),
                v=hit.v[:n].reshape(shape), tri=hit.tri[:n].reshape(shape),
            )
        raise ValueError(self.method)

    def closest_shaded(self, rays: Rays):
        """(Hit, shade) where shade = (albedo, emission, raw normal) per ray
        straight from the traversal kernel, or None when the engine cannot
        emit them.  The BVH8 kernel selects the winning triangle's shading
        lanes during the walk, so the hard render skips the per-ray
        (R, 15) table-row gather entirely (~17 ms of a 62 ms 1080p frame at
        1M tris — docs/PERF.md round 5)."""
        if self.method == "pallas8":
            from tpurt.kernels.traverse8 import traverse_pallas8

            return traverse_pallas8(
                rays, self.scene.tris, self.wide, shade_out=True
            )
        return self.closest(rays), None

    # -- K nearest extended hits (soft/differentiable path) ---------------
    def k_nearest(self, rays: Rays, k: int, band: float) -> KHits:
        if self.method == "ring":
            # partitioned scene: rotate per-ray (t, id) k-lists around the
            # ring (dist/ring.ring_k_nearest) — the discrete ids then feed
            # the same stop-grad soft machinery as every replicated engine,
            # which is what makes DIFFERENTIABLE rendering work over a
            # partitioned scene (round 4 raised here).
            from tpurt.dist.ring import ring_k_nearest

            flat, n, _ = self._ring_pad(rays)
            ids = ring_k_nearest(
                self.mesh, flat, self.part, self.table, k, band,
                pbvh=self.pbvh,
            )[:n]
            z = jnp.zeros(ids.shape, jnp.float32)
            return KHits(t=z, u=z, v=z, tri=ids.reshape(*rays.shape, k))
        if self.method == "brute":
            return k_nearest_brute(rays, self.scene.tris, k=k, band=band)
        if self.method == "bvh":
            from tpurt.accel.traverse_ref import k_nearest_ref

            return k_nearest_ref(rays, self.scene.tris, self.bvh, k=k, band=band)
        if self.method in ("packet", "wave", "pallas", "pallas8"):
            if self.method == "packet":
                from tpurt.accel.packet import k_nearest_ids_packet as knid

                ids = knid(rays, self.scene.tris, self.packed, k=k, band=band)
            elif self.method == "wave":
                from tpurt.accel.wavefront import wave_k_ids

                ids = wave_k_ids(rays, self.scene.tris, self.bvh, k=k, band=band)
            elif self.method == "pallas8":
                from tpurt.kernels.traverse8 import k_nearest_ids_pallas8

                ids = k_nearest_ids_pallas8(
                    rays, self.scene.tris, self.wide, k=k, band=band
                )
            else:
                from tpurt.kernels.traverse import k_nearest_ids_pallas as knid

                ids = knid(rays, self.scene.tris, self.packed, k=k, band=band)
            # Front-to-back ids only; (t,u,v) are recomputed differentiably
            # downstream (_surface_attrs), so zeros are fine as placeholders.
            z = jnp.zeros(ids.shape, jnp.float32)
            return KHits(t=z, u=z, v=z, tri=ids.reshape(*rays.shape, k))
        raise ValueError(self.method)

    # -- shadow visibility ------------------------------------------------
    def visibility(
        self, rays: Rays, t_max: Array, soft: bool = False,
        sharpness: float = 0.0, band: float = 0.0
    ) -> Array:
        """HARD transmittance in (t_min, t_max): 1 visible, 0 occluded.

        The soft path no longer routes through here: it collects shared
        candidate ids once via `occluder_ids` and evaluates every layer with
        diff/softvis.soft_occlusion_layers (see _render_soft)."""
        if soft:
            raise ValueError(
                "soft visibility moved to occluder_ids + soft_occlusion_layers"
            )
        if self.method == "brute":
            return 1.0 - occluded_brute(
                rays, self.scene.tris, t_max=t_max
            ).astype(jnp.float32)
        if self.method == "bvh":
            from tpurt.accel.traverse_ref import occluded_ref

            occ = occluded_ref(rays, self.scene.tris, self.bvh, t_max=t_max)
        elif self.method == "packet":
            from tpurt.accel.packet import occluded_packet

            occ = occluded_packet(rays, self.scene.tris, self.packed, t_max=t_max)
        elif self.method == "wave":
            from tpurt.accel.wavefront import wave_occluded

            occ = wave_occluded(rays, self.scene.tris, self.bvh, t_max=t_max)
        elif self.method == "pallas":
            from tpurt.kernels.traverse import occluded_pallas

            occ = occluded_pallas(rays, self.scene.tris, self.packed, t_max=t_max)
        elif self.method == "pallas8":
            from tpurt.kernels.traverse8 import occluded_pallas8

            occ = occluded_pallas8(rays, self.scene.tris, self.wide, t_max=t_max)
        elif self.method == "ring":
            from tpurt.dist.ring import ring_occluded

            shape = rays.shape
            tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), shape)
            flat, n, (tm,) = self._ring_pad(rays, tmax_arr)
            occ = ring_occluded(self.mesh, flat, self.part, tm,
                                pbvh=self.pbvh)[:n].reshape(shape)
        else:
            raise ValueError(self.method)
        return 1.0 - occ.astype(jnp.float32)

    def occluder_ids(
        self, rays: Rays, t_max: Array, k_occ: int, band: float
    ) -> Array:
        """Nearest-k_occ extended-occluder tri ids per flat ray, (N, k_occ)
        int32 (-1 padding) — the discrete candidate structure the soft
        shadow model is evaluated over (stop-gradient; every engine agrees
        on the candidate SET up to t-ties, so the soft image is
        engine-independent exactly like the hard one)."""
        tmax_arr = jnp.broadcast_to(
            jnp.asarray(t_max, jnp.float32), rays.shape
        ).reshape(-1)
        flat = Rays(o=rays.o.reshape(-1, 3), d=rays.d.reshape(-1, 3))
        if self.method == "brute":
            kh = k_nearest_brute(
                flat, self.scene.tris, k=k_occ, band=band,
                t_max=2.0 * tmax_arr.reshape(-1, 1),
            )
            ids = kh.tri.reshape(-1, kh.k)
            # pad to k_occ for tiny scenes (k_nearest_brute clamps k to T)
            if ids.shape[1] < k_occ:
                ids = jnp.pad(ids, ((0, 0), (0, k_occ - ids.shape[1])),
                              constant_values=-1)
        elif self.method == "bvh":
            from tpurt.accel.traverse_ref import occluder_ids_ref

            ids = occluder_ids_ref(flat, self.scene.tris, self.bvh, k_occ,
                                   band, DEFAULT_T_MIN, 2.0 * tmax_arr)
        elif self.method == "packet":
            from tpurt.accel.packet import k_nearest_ids_packet as knid

            ids = knid(flat, self.scene.tris, self.packed, k=k_occ,
                       band=band, t_max=2.0 * tmax_arr)
        elif self.method == "wave":
            from tpurt.accel.wavefront import wave_k_ids

            ids = wave_k_ids(flat, self.scene.tris, self.bvh, k=k_occ,
                             band=band, t_max=2.0 * tmax_arr)
        elif self.method == "pallas8":
            from tpurt.kernels.traverse8 import k_nearest_ids_pallas8

            ids = k_nearest_ids_pallas8(
                flat, self.scene.tris, self.wide, k=k_occ,
                band=band, t_max=2.0 * tmax_arr,
            )
        elif self.method == "pallas":
            from tpurt.kernels.traverse import k_nearest_ids_pallas as knid

            ids = knid(flat, self.scene.tris, self.packed, k=k_occ,
                       band=band, t_max=2.0 * tmax_arr)
        elif self.method == "ring":
            from tpurt.dist.ring import ring_k_nearest

            flat2, n, (tm2,) = self._ring_pad(flat, tmax_arr)
            ids = ring_k_nearest(
                self.mesh, flat2, self.part, self.table, k_occ, band,
                t_max=2.0 * tm2, pbvh=self.pbvh,
            )[:n]
        else:
            raise ValueError(self.method)
        return jax.lax.stop_gradient(ids)


def make_tracer(
    scene: Scene, method: str = "brute", leaf_size: int = 8, band: float = 0.0,
    mesh=None, ring_engine: str = "pallas8",
) -> Tracer:
    """Build a Tracer (and its BVH when method needs one).

    band must match the soft path's barycentric band when rendering with
    soft=True: node AABBs are inflated so extended near-miss hits are found.
    method='ring' (requires `mesh`): Morton-partition the scene across the
    mesh with per-partition packed BVHs — BASELINE config 5's sharded-scene
    path, reachable from the API (hard rendering only).
    """
    if method == "ring":
        if mesh is None:
            raise ValueError("method='ring' needs a jax.sharding.Mesh")
        from tpurt.dist.scene_partition import (
            build_partition_bvhs, build_partition_wides, partition_scene,
        )

        part = partition_scene(scene.tris, mesh.devices.size)
        if ring_engine == "pallas8":
            # per-partition WideBVHs: the production BVH8 kernel runs on
            # each device's chunk (VERDICT r4 missing #4); host-side
            # collapse per partition, so not jittable — fit loops that
            # rebuild in-step use ring_engine='packet'
            pbvh = build_partition_wides(part, scene.tris, band=band)
        elif ring_engine == "packet":
            pbvh = build_partition_bvhs(part, leaf_size=leaf_size, band=band)
        else:
            raise ValueError(ring_engine)
        return Tracer(scene=scene, method=method, part=part, pbvh=pbvh,
                      mesh=mesh, table=tri_table(scene.tris))
    if method == "brute":
        return Tracer(scene=scene, bvh=None, method=method,
                      table=tri_table(scene.tris))
    from tpurt.accel.lbvh import build_lbvh

    # jit the build: eager op-by-op dispatch of the O(log N) level passes is
    # dispatch-bound on accelerators (observed 278s eager vs ~1s jitted for
    # a 70K-tri scene on one TPU chip).
    build = jax.jit(
        build_lbvh, static_argnames=("leaf_size", "band", "sort_backend", "max_depth")
    )
    bvh = build(scene.tris, leaf_size=leaf_size, band=band)
    packed = None
    wide = None
    if method in ("packet", "pallas"):
        from tpurt.accel.packet import max_cut_leaves, pack_bvh

        # static bound, not int(flat_is_leaf.sum()): no device->host sync
        n_leaves = max_cut_leaves(scene.tris.num_tris, leaf_size)
        packed = jax.jit(pack_bvh, static_argnames=("n_leaves",))(
            scene.tris, bvh, n_leaves=n_leaves
        )
    if method == "pallas8":
        from tpurt.accel.bvh8 import build_wide

        # one host sync (the greedy collapse is host-side; topology is
        # frozen afterwards — the fit loop refits boxes only)
        wide = build_wide(scene.tris, bvh)
    return Tracer(scene=scene, bvh=bvh, packed=packed, wide=wide,
                  method=method, table=tri_table(scene.tris))


# ---------------------------------------------------------------------------
# Shading from hit records
# ---------------------------------------------------------------------------
def _surface_attrs(rays: Rays, table: Array, tri_id: Array):
    """Differentiable surface attributes for given (stop-grad) triangle ids.

    ONE table-row gather per (ray, layer) — see tri_table — then (t,u,v)
    recomputed analytically from ray and gathered geometry so the gradient
    path is identical regardless of which engine produced the ids.
    Returns (t, u, v, p, n, albedo, emission, cos_dn); callers mask invalid
    ids.
    """
    tid = jax.lax.stop_gradient(jnp.maximum(tri_id, 0))
    row = gather_verts(table, tid)           # (..., 15)
    v0, e1, e2 = row[..., 0:3], row[..., 3:6], row[..., 6:9]
    v1 = v0 + e1
    v2 = v0 + e2
    # (t, u, v) via the analytic custom VJP (diff/intersect_vjp.py): same
    # formulas/values as the inline MT it replaced, but backward keeps only
    # the five primal inputs live instead of autodiff residuals.
    t, u, v = intersect_tuv(rays.o, rays.d, v0, v1, v2)
    pvec = jnp.cross(rays.d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    p = rays.o + t[..., None] * rays.d
    n_raw = jnp.cross(e1, e2)
    n_len = jnp.maximum(jnp.linalg.norm(n_raw, axis=-1, keepdims=True), 1e-20)
    n = n_raw / n_len
    # |cos| between ray and face normal — feeds the grazing gate
    # (diff/softvis.det_gate) in the soft path.
    d_len = jnp.maximum(jnp.linalg.norm(rays.d, axis=-1), 1e-20)
    cos_dn = det / (d_len * n_len[..., 0])
    n = face_forward(n, rays.d)
    return t, u, v, p, n, row[..., 9:12], row[..., 12:15], cos_dn


def _shade_layer(
    tracer: Tracer,
    rays: Rays,
    tri_id: Array,
    valid: Array,
    light_samples: int = 0,
    key: Array | None = None,
    hit: Hit | None = None,
    shade=None,
):
    """Shade the closest-hit layer with HARD shadow rays; returns color (R,3).

    light_samples > 0 adds Monte-Carlo direct lighting from the scene's
    emissive triangles (area lights -> physically-based soft shadows); the
    emitter sample points are shared across the ray batch per call.
    (hit, shade): kernel-emitted per-hit attributes (Tracer.closest_shaded)
    that replace the _surface_attrs table gather on the hard path.
    """
    scene = tracer.scene
    if shade is not None and hit is not None:
        albedo, emission, n_raw = shade
        t_eff = jnp.where(valid, hit.t, 1.0)  # miss t = T_MAX would overflow
        p = rays.o + t_eff[..., None] * rays.d
        n_len = jnp.maximum(
            jnp.linalg.norm(n_raw, axis=-1, keepdims=True), 1e-20
        )
        n = face_forward(n_raw / n_len, rays.d)
    else:
        _, u, v, p, n, albedo, emission, cos_dn = _surface_attrs(
            rays, tracer.table, tri_id)
    wi, dist, _ = light_dirs(p, scene.lights)
    # Shadow rays: one per (ray, light), flattened LIGHT-major — adjacent
    # rays in a packet then share one light (coherent subtrees); ray-major
    # interleaving (r0l0, r0l1, r1l0, ...) makes every packet a mix of all
    # lights and defeats the packet/Pallas engines' shared-cursor walk.
    L = scene.lights.pos.shape[0]
    R = p.shape[0]
    o_surf = p + SHADOW_EPS * n
    if L > 0:
        o_sh = jnp.broadcast_to(o_surf[None], (L, R, 3)).reshape(-1, 3)
        d_sh = wi.transpose(1, 0, 2).reshape(-1, 3)
        # Invalid (miss) rays get t_max = 0: every slab test fails instantly
        # and the occlusion kernel's all-blocked drain retires their packets
        # early instead of walking garbage segments from clamped-id points.
        t_sh = jnp.where(valid[:, None], dist * SHADOW_T_FRAC, 0.0).T.reshape(-1)
        vis = tracer.visibility(
            Rays(o=o_sh, d=d_sh), t_max=t_sh
        ).reshape(L, R).T
    else:  # area-light-only scenes: no point-light shadow rays to trace
        vis = jnp.zeros((R, 0), jnp.float32)
    color = shade_lambert(p, n, albedo, emission, scene.lights, vis, scene.ambient)

    if light_samples > 0 and key is not None:
        lp, ln_, le, pdf, _ = sample_emitters(key, scene.tris, light_samples)
        delta = lp[None, :, :] - o_surf[:, None, :]  # (R, S, 3)
        ldist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-12))
        lwi = delta / ldist[..., None]
        # sample-major flattening: same coherence argument as point lights
        S = light_samples
        o_al = jnp.broadcast_to(o_surf[None], (S, R, 3)).reshape(-1, 3)
        vis_al = tracer.visibility(
            Rays(o=o_al, d=lwi.transpose(1, 0, 2).reshape(-1, 3)),
            t_max=jnp.where(valid[:, None], ldist * SHADOW_T_FRAC, 0.0)
            .T.reshape(-1),
        ).reshape(S, R).T
        color = color + area_light_contrib(p, n, albedo, lp, ln_, le, pdf, vis_al)

    color = jnp.where(valid[..., None], color, 0.0)
    return color


# ---------------------------------------------------------------------------
# Entry points
# ---------------------------------------------------------------------------
def render_rays(
    tracer: Tracer,
    rays: Rays,
    *,
    soft: bool = False,
    k_layers: int = 4,
    sharpness: float = 100.0,
    band: float = 0.08,
    k_occ: int = 8,
    light_samples: int = 0,
    key: Array | None = None,
) -> Array:
    """Radiance for a flat batch of rays -> (R, 3).

    soft=False: hard closest-hit render (fast path).
    soft=True: alpha-composited K-layer soft render — the differentiable
    forward model whose jax.grad matches finite differences (diff/softvis.py).
    k_occ: candidate occluders per (ray, light) in the soft shadow model
    (shared across layers; engines agree on the set, so the soft image is
    engine-independent when segments cross <= k_occ extended occluders).
    light_samples/key: Monte-Carlo area-light sampling of emissive triangles
    (render/shade.sample_emitters) on top of the point lights.
    """
    if not soft:
        scene = tracer.scene
        hit, shade = tracer.closest_shaded(rays)
        color = _shade_layer(
            tracer, rays, hit.tri, hit.valid, light_samples, key,
            hit=hit, shade=shade,
        )
        bg = jnp.broadcast_to(scene.background, color.shape)
        return jnp.where(hit.valid[..., None], color, bg)
    return _render_soft(tracer, rays, k_layers, sharpness, band, k_occ,
                        light_samples, key)


def _render_soft(
    tracer: Tracer,
    rays: Rays,
    k_layers: int,
    sharpness: float,
    band: float,
    k_occ: int,
    light_samples: int,
    key: Array | None,
) -> Array:
    """K-layer soft render, vectorized over layers with SHARED shadow
    candidates, all dense math in SoA (ray-index-LAST) component form.

    Round 4 vectorized the layers but left the dense math on AoS shapes
    like (R, K, L, C, 3) whose tiny trailing dims tile onto the TPU's
    (8, 128) registers at ~1/16 lane efficiency — the soft forward's
    surface-attr and occlusion stages measured 74 + 105 ms at 262K rays
    with only ~27 ms of that being the actual row gathers (docs/PERF.md
    round 5).  This version keeps the R axis last everywhere (vectors as
    3-component lists, diff/softvis.dot3/cross3), which is the same SoA
    discipline the Pallas kernels use:
    - hit ids for all K layers come from ONE k-nearest walk,
    - surface attributes come from one fused (K, R) table-row gather with
      Möller–Trumbore recomputed in component form (one segment-sum on the
      way back, diff/gather_grad),
    - shadow candidates are traced ONCE per (ray, light) from the nearest
      layer and evaluated for every layer by soft_occlusion_layers_soa,
    - shading is one shade_lambert over the (R*K) layer points.
    """
    from tpurt.diff.softvis import cross3, dot3, soft_occlusion_layers_soa

    scene = tracer.scene
    # Hit ids are discrete structure; attrs are recomputed differentiably,
    # so the whole KHits record is stop-gradient (this also keeps
    # reverse-mode AD out of while-loop traversal engines).
    kh = jax.lax.stop_gradient(tracer.k_nearest(rays, k=k_layers, band=band))
    k = kh.k
    ids = kh.tri                                   # (R, K)
    R = ids.shape[0]
    idsT = ids.T                                   # (K, R)
    valid = idsT >= 0
    # --- SoA surface attributes: one fused row gather, R-last math -------
    # grad_cols=12: the emission columns are gradient-dead by construction
    # (tri_table builds them from tris.emission, which is never a fit
    # parameter), so the backward segment-sum skips sorting them
    row = gather_verts(tracer.table, jnp.maximum(idsT, 0), 12)  # (K, R, 15)
    c = [row[..., i] for i in range(15)]                       # 15 x (K, R)
    v0, e1, e2, alb, emi = c[0:3], c[3:6], c[6:9], c[9:12], c[12:15]
    oc = [rays.o[:, i][None] for i in range(3)]                # (1, R)
    dc = [rays.d[:, i][None] for i in range(3)]
    pv = cross3(dc, e2)
    det = dot3(e1, pv)                                         # (K, R)
    inv = det / (det * det + DET_EPS)                          # smooth
    tv = [oc[i] - v0[i] for i in range(3)]
    u = dot3(tv, pv) * inv
    qv = cross3(tv, e1)
    v = dot3(dc, qv) * inv
    t = dot3(e2, qv) * inv
    nr = cross3(e1, e2)
    inv_nlen = jax.lax.rsqrt(jnp.maximum(dot3(nr, nr), 1e-40))
    inv_dlen = jax.lax.rsqrt(jnp.maximum(dot3(dc, dc), 1e-40))
    cos_dn = det * inv_nlen * inv_dlen
    flip = jnp.where(dot3(nr, dc) > 0.0, -inv_nlen, inv_nlen)
    n_ = [nr[i] * flip for i in range(3)]                      # unit, faced
    p_ = [oc[i] + t * dc[i] for i in range(3)]                 # (K, R)
    alphas = coverage(u, v, sharpness, valid, band) * det_gate(cos_dn)
    o_surf = [p_[i] + SHADOW_EPS * n_[i] for i in range(3)]
    valid0 = valid[0]                                          # (R,)
    L = scene.lights.pos.shape[0]

    def shared_vis(light_pos, n_l):
        """Soft transmittance (K, n_l, R) toward n_l point positions from
        every layer, candidates traced once from layer 0 (light-major)."""
        lp = [light_pos[:, i][None, :, None] for i in range(3)]  # (1,nl,1)
        delta = [lp[i] - p_[i][:, None, :] for i in range(3)]    # (K,nl,R)
        dist = jnp.sqrt(jnp.maximum(dot3(delta, delta), 1e-12))
        wi = [delta[i] / dist for i in range(3)]
        # trace from layer 0, light-major flat (nl*R,)
        o_sh = jnp.stack(
            [jnp.broadcast_to(o_surf[i][0][None], (n_l, R)) for i in range(3)],
            axis=-1,
        ).reshape(-1, 3)
        d_sh = jnp.stack(
            [wi[i][0] for i in range(3)], axis=-1
        ).reshape(-1, 3)  # layer 0, light-major (nl*R, 3)
        # miss rays: zero-length segments -> the walk drains immediately
        t_cand = jnp.where(valid0[None], dist[0], 0.0).reshape(-1)
        occ = tracer.occluder_ids(
            Rays(o=o_sh, d=d_sh), t_cand * SHADOW_T_FRAC, k_occ, band
        ).reshape(n_l, R, k_occ).transpose(0, 2, 1)             # (nl, C, R)
        return soft_occlusion_layers_soa(
            [o_surf[i][:, None, None, :] for i in range(3)],
            [wi[i][:, :, None, :] for i in range(3)],
            (dist * SHADOW_T_FRAC)[:, :, None, :],
            occ, tracer.table, sharpness, band,
        )                                                       # (K, nl, R)

    def vis_to_aos(vis_klr):
        # (K, nl, R) -> (R*K, nl) matching the ray-major layer flattening
        return vis_klr.transpose(2, 0, 1).reshape(R * k, -1)

    if L > 0:
        vis = vis_to_aos(shared_vis(scene.lights.pos, L))
    else:
        vis = jnp.zeros((R * k, 0), jnp.float32)

    def aos3(comps):
        # 3 x (K, R) -> (R*K, 3) in ray-major layer order
        return jnp.stack(comps, axis=-1).transpose(1, 0, 2).reshape(-1, 3)

    pf, nf = aos3(p_), aos3(n_)
    color = shade_lambert(
        pf, nf, aos3(alb), aos3(emi), scene.lights, vis, scene.ambient,
    )
    if light_samples > 0 and key is not None:
        lp, ln_, le, pdf, _ = sample_emitters(key, scene.tris, light_samples)
        vis_al = vis_to_aos(shared_vis(lp, light_samples))
        color = color + area_light_contrib(
            pf, nf, aos3(alb), lp, ln_, le, pdf, vis_al
        )
    colors = jnp.where(valid.T[..., None], color.reshape(R, k, 3), 0.0)
    return composite(alphas.T, colors, scene.background)


def render(
    scene: Scene,
    cam,
    *,
    method: str = "brute",
    tracer: Tracer | None = None,
    soft: bool = False,
    k_layers: int = 4,
    sharpness: float = 100.0,
    band: float = 0.08,
    k_occ: int = 8,
    spp: int = 1,
    key: Array | None = None,
    light_samples: int = 0,
) -> Array:
    """Render an image (H, W, 3) linear radiance.

    light_samples > 0 (requires `key`) turns emissive triangles into sampled
    area lights; combine with spp > 1 for converged soft shadows.
    """
    if tracer is None:
        # Soft renders need band-inflated node AABBs or extended near-miss
        # hits fall outside the boxes and get culled engine-dependently.
        tracer = make_tracer(scene, method, band=band if soft else 0.0)
    else:
        tracer = tracer.replace(scene=scene, table=tri_table(scene.tris))

    def one_sample(jitter, skey):
        rays = gen_primary_rays(cam, jitter)
        return render_rays(
            tracer, rays, soft=soft, k_layers=k_layers,
            sharpness=sharpness, band=band, k_occ=k_occ,
            light_samples=light_samples, key=skey,
        )

    if spp <= 1 or key is None:
        img = one_sample(None, key)
    else:
        keys = jax.random.split(key, spp)

        def body(carry, k):
            k1, k2 = jax.random.split(k)
            jit2 = sample_square(k1, (cam.num_pixels,))
            return carry + one_sample(jit2, k2), None

        img, _ = jax.lax.scan(body, jnp.zeros((cam.num_pixels, 3)), keys)
        img = img / spp
    return img.reshape(cam.height, cam.width, 3)
