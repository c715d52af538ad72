"""tpurt CLI: render / build-bvh / fit / bench / check-grads (SURVEY.md §2b #27).

Thin wrapper over the api/ layer; every knob is a `--key=value` override onto
the frozen Config dataclasses (api/config.py). The reference has no CLI to
mirror (SURVEY.md §0).

    python -m tpurt.cli.main render --scene cornell --width 256 -o out.png
    python -m tpurt.cli.main build-bvh --scene bunny --tris 10000
    python -m tpurt.cli.main fit --scene cornell --steps 50 --perturb 0.03
    python -m tpurt.cli.main check-grads --scene cornell --width 12
    python -m tpurt.cli.main bench --tris 100000
"""

from __future__ import annotations

import argparse
import sys
import time


def _scene(args):
    from tpurt.core.scene import get_scene

    kw = {}
    if args.scene in ("sponza", "sponza5m", "bunny"):
        if args.tris:
            kw["num_tris"] = args.tris
    if args.scene in ("sponza", "sponza5m") and args.width:
        kw["width"], kw["height"] = args.width, args.height or args.width
    scene, cam = get_scene(args.scene, **kw)
    if args.width and args.scene not in ("sponza", "sponza5m"):
        cam = cam.replace(width=args.width, height=args.height or args.width)
    return scene, cam


def _save_image(img, path: str) -> None:
    import numpy as np

    from tpurt.core.math import to_uint8

    arr = np.asarray(to_uint8(img))
    if path.endswith(".npy"):
        np.save(path, np.asarray(img))
        return
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except ImportError:  # fall back to dependency-free binary PPM
        if not path.endswith(".ppm"):
            path += ".ppm"
        with open(path, "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
            f.write(arr.tobytes())


def cmd_render(args) -> int:
    from tpurt.api.config import RenderConfig
    from tpurt.api.renderer import Renderer
    from tpurt.obs import get_logger, trace_span

    log = get_logger()
    scene, cam = _scene(args)
    cfg = RenderConfig(method=args.method, spp=args.spp,
                       light_samples=args.light_samples, light_seed=args.seed)
    mesh = None
    if args.shard:
        from tpurt.dist.shard import make_mesh

        mesh = make_mesh()
    with trace_span("render", log=True):
        r = Renderer(scene, cfg, mesh=mesh)
        img = r.render(cam)
        img.block_until_ready()
    _save_image(img, args.out)
    log.info("wrote %s (%dx%d, %d tris)", args.out, cam.width, cam.height, scene.num_tris)
    return 0


def cmd_build_bvh(args) -> int:
    import jax

    from tpurt.accel.lbvh import build_lbvh
    from tpurt.obs import emit

    scene, _ = _scene(args)
    build = jax.jit(lambda t: build_lbvh(t, leaf_size=args.leaf_size))
    bvh = build(scene.tris)
    jax.block_until_ready(bvh)
    t0 = time.perf_counter()
    jax.block_until_ready(build(scene.tris))
    dt = time.perf_counter() - t0
    emit("bvh_build", scene.num_tris / dt, "tris/s", tris=scene.num_tris, seconds=dt)
    return 0


def cmd_fit(args) -> int:
    from tpurt.api.config import FitConfig, RenderConfig
    from tpurt.api.inverse import InverseRenderer
    from tpurt.obs import get_logger
    from tpurt.render.pipeline import render

    log = get_logger()
    scene, cam = _scene(args)
    rcfg = RenderConfig(
        method=args.method, soft=True, k_layers=4, sharpness=40.0, band=0.15
    )
    target = render(scene, cam, method=args.method, **rcfg.render_kwargs())
    perturbed = scene.replace(
        tris=scene.tris.replace(verts=scene.tris.verts * (1.0 + args.perturb))
    )
    mesh = None
    if args.shard:
        from tpurt.dist.shard import make_mesh

        mesh = make_mesh()
    inv = InverseRenderer(
        perturbed,
        cam,
        fit=FitConfig(
            steps=args.steps, lr=args.lr, ckpt_path=args.ckpt, ckpt_every=args.ckpt_every
        ),
        render=rcfg,
        mesh=mesh,
    )
    res = inv.fit(target, callback=lambda i, l: log.info("step %d loss %.3e", i, l))
    log.info("fit done: loss %.3e -> %.3e", res.losses[0], res.losses[-1])
    return 0 if res.losses[-1] < res.losses[0] else 1


def cmd_check_grads(args) -> int:
    """FD gradient gate through ANY engine (--method): the production paths
    refit in-loss exactly like the fit step, so this validates the path
    users actually train on, not just the brute oracle (VERDICT r4)."""
    import jax
    import jax.numpy as jnp

    from tpurt.diff.fdcheck import check_grads_fd
    from tpurt.obs import get_logger
    from tpurt.render.pipeline import make_tracer, render, tri_table

    log = get_logger()
    scene, cam = _scene(args)
    # generic position: tiny deterministic jitter + off-axis light — an
    # axis-aligned scene places whole faces on max(n·l, 0)/min-barycentric
    # KINKS where no one-sided derivative matches a central difference
    # (same treatment as tests/grad/test_fdcheck.generic_cornell)
    jit = 0.015 * (
        jax.random.uniform(jax.random.PRNGKey(9), scene.tris.verts.shape) * 2
        - 1.0
    )
    scene = scene.replace(tris=scene.tris.replace(verts=scene.tris.verts + jit))
    band, soft_kw = 0.25, dict(soft=True, k_layers=8, sharpness=30.0, band=0.25)
    method = args.method
    tracer0 = make_tracer(scene, method, band=band)

    def loss(verts):
        tris = scene.tris.replace(verts=verts)
        sc = scene.replace(tris=tris)
        tracer = tracer0
        if tracer0.bvh is not None:
            from tpurt.accel.refit import refit_aabbs

            stris = jax.lax.stop_gradient(tris)
            bvh = refit_aabbs(
                tracer0.bvh, stris,
                update_flat=method in ("bvh", "wave", "packet", "pallas"),
            )
            wide, packed = tracer0.wide, tracer0.packed
            if wide is not None:
                from tpurt.accel.bvh8 import refit_wide

                wide = refit_wide(wide, bvh, stris)
            if packed is not None:
                from tpurt.accel.packet import refit_packed

                packed = refit_packed(packed, bvh, stris)
            tracer = tracer0.replace(bvh=bvh, wide=wide, packed=packed)
        tracer = tracer.replace(scene=sc, table=tri_table(tris))
        img = render(sc, cam, tracer=tracer, **soft_kw)
        return jnp.mean(img**2)

    report = check_grads_fd(loss, scene.tris.verts, max_probes_per_leaf=args.probes)
    log.info("check-grads[%s]: %s", method, report)
    return 0 if report["ok"] else 1


def cmd_bench(args) -> int:
    import os
    import runpy

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(__file__))))
    sys.argv = ["bench.py"]
    if args.tris:
        sys.argv += ["--tris", str(args.tris)]
    if args.method != "auto":
        sys.argv += ["--method", args.method]
    runpy.run_path(os.path.join(root, "bench.py"), run_name="__main__")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tpurt", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--scene", default="cornell", help="cornell|bunny|sponza|*.obj")
        sp.add_argument("--tris", type=int, default=0)
        sp.add_argument("--width", type=int, default=0)
        sp.add_argument("--height", type=int, default=0)
        sp.add_argument("--method", default="bvh", help="brute|bvh|pallas")

    sp = sub.add_parser("render", help="render a scene to an image")
    common(sp)
    sp.add_argument("-o", "--out", default="out.png")
    sp.add_argument("--spp", type=int, default=1)
    sp.add_argument("--light-samples", type=int, default=0,
                    help="area-light samples per shading point (emissive tris)")
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--shard", action="store_true", help="shard rays over all devices")
    sp.set_defaults(fn=cmd_render)

    sp = sub.add_parser("build-bvh", help="build the LBVH and report tris/s")
    common(sp)
    sp.add_argument("--leaf-size", type=int, default=8)
    sp.set_defaults(fn=cmd_build_bvh)

    sp = sub.add_parser("fit", help="inverse-render a perturbed scene back to target")
    common(sp)
    sp.add_argument("--steps", type=int, default=50)
    sp.add_argument("--lr", type=float, default=1e-2)
    sp.add_argument("--perturb", type=float, default=0.02)
    sp.add_argument("--shard", action="store_true")
    sp.add_argument("--ckpt", default=None)
    sp.add_argument("--ckpt-every", type=int, default=50)
    sp.set_defaults(fn=cmd_fit)

    sp = sub.add_parser("check-grads", help="finite-difference gradient gate")
    common(sp)
    sp.add_argument("--probes", type=int, default=8)
    sp.set_defaults(fn=cmd_check_grads)

    sp = sub.add_parser("bench", help="run the rays/s benchmark harness")
    common(sp)
    sp.set_defaults(fn=cmd_bench)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
