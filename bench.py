"""Benchmark harness: primary rays/s/chip on the target scene.

Run by the driver on real TPU hardware at the end of every round; prints ONE
JSON line:  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline (BASELINE.json:5): >= 100M primary rays/s/chip forward on a
1M-triangle scene.  vs_baseline is value / 100e6.

Usage: python bench.py [--scene sponza] [--tris 1000000] [--width 1920]
                       [--height 1080] [--method auto] [--mode fwd]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "src"))

BASELINE_RAYS_PER_S = 100e6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="sponza")
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument(
        "--method", default="auto", help="auto|pallas|bvh|brute (auto = best available)"
    )
    ap.add_argument("--mode", default="fwd", choices=["fwd", "fwd_bwd"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpurt.core.geometry import Rays
    from tpurt.core.scene import get_scene
    from tpurt.render.camera import gen_primary_rays
    from tpurt.render.pipeline import make_tracer, render_rays

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}", file=sys.stderr)

    kw = {}
    if args.scene in ("sponza", "sponza5m"):
        kw = dict(num_tris=args.tris, width=args.width, height=args.height)
    scene, cam = get_scene(args.scene, **kw)

    method = args.method
    if method == "auto":
        try:
            from tpurt.kernels.traverse import traverse_pallas  # noqa: F401

            method = "pallas" if dev.platform != "cpu" else "bvh"
        except ImportError:
            method = "bvh"
    print(f"# scene={args.scene} tris={scene.num_tris} "
          f"rays={cam.num_pixels} method={method}", file=sys.stderr)

    t0 = time.perf_counter()
    tracer = make_tracer(scene, method=method)
    jax.block_until_ready(tracer.bvh.flat_lo if tracer.bvh is not None else scene.tris.verts)
    print(f"# bvh build: {time.perf_counter()-t0:.2f}s", file=sys.stderr)

    rays = gen_primary_rays(cam)
    n_rays = cam.num_pixels

    if args.mode == "fwd":
        fn = jax.jit(lambda tr, o, d: render_rays(tr, Rays(o=o, d=d)))
        metric = "primary_rays_per_s_per_chip_fwd"
    else:
        rkw = dict(soft=True, k_layers=4, sharpness=40.0, band=0.08)
        tracer = make_tracer(scene, method=method, band=rkw["band"])

        def loss(verts, tr, o, d):
            sc = tr.scene
            sc = sc.replace(tris=sc.tris.replace(verts=verts))
            colors = render_rays(tr.replace(scene=sc), Rays(o=o, d=d), **rkw)
            return jnp.sum(colors * colors)

        g = jax.grad(loss)
        fn = jax.jit(lambda tr, o, d: g(tr.scene.tris.verts, tr, o, d))
        metric = "primary_rays_per_s_per_chip_fwd_bwd"

    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(tracer, rays.o, rays.d))
    print(f"# compile+first run: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
    for _ in range(args.warmup):
        out = fn(tracer, rays.o, rays.d)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fn(tracer, rays.o, rays.d)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / args.iters

    rays_per_s = n_rays / dt
    print(f"# {dt*1e3:.2f} ms/frame", file=sys.stderr)
    print(json.dumps({
        "metric": metric,
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()
