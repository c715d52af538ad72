"""Benchmark harness: primary rays/s/chip on the target scene.

Run by the driver on real TPU hardware at the end of every round; prints ONE
JSON line on stdout:  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
— always, even when individual engines fail (VERDICT r1 weak #3: a bench
harness must degrade, subset, and report — never crash).

Design:
- Rays are benchmarked on a flat CHUNK of the frame's rays (default 256K).
  rays/s is a rate, so timing a subset is an honest measurement and bounds
  the worst-case wall time of a slow engine at any scene size.
- Methods are tried in a fallback chain; the JSON row reports BOTH the
  requested method and the engine that actually ran (no silent substitution:
  kernels/traverse.py's VMEM fallback is resolved here, up front).
- Every stage (scene gen, BVH build, compile, run) is wrapped; on total
  failure the row carries value 0 and an "error" field, rc stays 0.

Baseline (BASELINE.json:5): >= 100M primary rays/s/chip forward on a
1M-triangle scene.  vs_baseline is value / 100e6.

Usage: python bench.py [--scene sponza] [--tris 1000000] [--width 1920]
                       [--height 1088] [--method auto] [--mode fwd|fwd_bwd]
                       [--bench-rays 262144] [--staged]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "src"))

BASELINE_RAYS_PER_S = 100e6


def log(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: cold-compile cost is paid once per
    machine, not once per bench invocation."""
    try:
        import jax

        cache = os.path.join(os.path.expanduser("~"), ".cache", "jax_tpurt")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never a failure
        log(f"compile cache unavailable: {e}")


_READBACK_LAT_S = 0.0


def _sync(out) -> None:
    """Force completion of all enqueued work via a REAL device->host read.

    `block_until_ready` relies on completion events, which the axon tunnel
    has been observed to fire immediately (docs/PERF.md "tunnel incident") —
    timing through it reports absurd rates.  A device_get of one element of
    the output cannot lie: execution is in-order per device, so reading any
    element of the last result back to the host proves every prior enqueued
    call finished.  Costs one small D2H (~_READBACK_LAT_S, measured and
    subtracted by callers)."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    if not leaves:
        return
    leaf = leaves[0]
    # The in-order-execution argument is per device: reading one element
    # proves completion only for the device holding it.  bench.py is
    # single-device today; fail loudly if an output ever becomes sharded so
    # a future multi-chip caller doesn't silently under-sync (ADVICE r2).
    if hasattr(leaf, "sharding") and len(leaf.sharding.device_set) > 1:
        raise RuntimeError(
            "_sync saw a multi-device output; read one element per shard "
            "instead of leaves[0] only"
        )
    jax.device_get(leaf.ravel()[:1])


def _measure_readback_latency() -> float:
    """Round-trip latency of the tiny `_sync` readback, for subtraction."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda a: a + 1)
    x = jnp.float32(1.0)
    _sync(f(x))  # warm compile + transfer path (first readback can be slow)
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(f(x))
        lats.append(time.perf_counter() - t0)
    return min(lats)


def timing_sane() -> bool:
    """Calibrate readback-based timing against a known-cost matmul.

    Also measures the readback round-trip latency into _READBACK_LAT_S so
    _bench_chunk can subtract it.  Returns False when the implied FLOP rate
    exceeds any real chip (2x a v5e's 197 bf16 TFLOP/s peak)."""
    global _READBACK_LAT_S
    import jax
    import jax.numpy as jnp

    try:
        _READBACK_LAT_S = _measure_readback_latency()
        log(f"readback latency: {_READBACK_LAT_S*1e3:.1f} ms")
        # Big chain on TPU (amortizes tunnel latency into <1% of the
        # measurement); small on CPU where an 8192^3 bf16 matmul chain alone
        # would take minutes (ADVICE r2).
        if jax.default_backend() == "cpu":
            n, reps = 2048, 2
        else:
            n, reps = 8192, 10
        x = jnp.ones((n, n), jnp.bfloat16)

        def chain(a):
            for _ in range(reps):
                a = (a @ a) * jnp.bfloat16(1.0 / n)
            return a

        f = jax.jit(chain)
        _sync(f(x))
        t0 = time.perf_counter()
        _sync(f(x))
        dt = (time.perf_counter() - t0 - _READBACK_LAT_S) / reps
        tflops = 2 * n**3 / max(dt, 1e-9) / 1e12
        log(f"timing calibration: {tflops:.1f} TFLOP/s implied "
            f"({dt*1e3:.2f} ms per {n}^3 bf16 matmul)")
        return 0.0 < tflops < 400.0
    except Exception as e:
        log(f"timing calibration failed: {e}")
        return True


def resolve_engine(method: str, tracer) -> str:
    """The engine that will ACTUALLY run for this tracer (surfaces the
    pallas->packet fallback instead of lying about it).

    Mirrors kernels/traverse._plan exactly (VERDICT r2 weak #4: the old
    fits_vmem-only check reported "packet" for the HBM tier _plan
    actually runs — honest labeling must cut both ways)."""
    if method == "pallas" and tracer.packed is not None:
        from tpurt.kernels.traverse import _plan

        if _plan(tracer.packed) is None:
            return "packet"
    if method == "pallas8" and getattr(tracer, "wide", None) is not None:
        from tpurt.kernels.traverse8 import plan8

        if plan8(tracer.wide) is None:
            return "packet"
    return method


def _bench_chunk(fn, args, n_rays: int, iters: int, warmup: int,
                 min_seconds: float = 0.5, profile_dir: str | None = None):
    """Compile + time fn(*args); returns (rays_per_s, ms_per_call, compile_s).

    profile_dir: capture a jax.profiler trace of a few timed calls — the
    artifact that shows whether collectives overlap compute (VERDICT #5).
    """
    import contextlib

    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    if profile_dir:
        os.makedirs(profile_dir, exist_ok=True)
        ctx = jax.profiler.trace(profile_dir)
    else:
        ctx = contextlib.nullcontext()
    # Run at least `iters` calls and at least `min_seconds` of wall time.
    # Sync is one tiny readback per batch of `iters` calls; its measured
    # round-trip latency is subtracted so high-latency tunnels don't skew
    # short runs.
    done, lat_paid = 0, 0.0
    t0 = time.perf_counter()
    with ctx:
        while True:
            for _ in range(iters):
                out = fn(*args)
            _sync(out)
            done += iters
            lat_paid += _READBACK_LAT_S
            dt = time.perf_counter() - t0
            if dt >= min_seconds + lat_paid or done >= 100 * iters:
                break
    if profile_dir:
        log(f"profiler trace written to {profile_dir}")
    per_call = max(dt - lat_paid, 1e-9) / done
    return n_rays / per_call, per_call * 1e3, compile_s


def run_one(scene, cam, method: str, mode: str, bench_rays: int,
            iters: int, warmup: int, profile_dir: str | None = None,
            ray_order: str = "morton") -> dict:
    """Benchmark one (scene, method, mode); raises on failure."""
    import jax
    import jax.numpy as jnp

    from tpurt.core.geometry import Rays
    from tpurt.render.camera import gen_primary_rays, pixel_morton_perm
    from tpurt.render.pipeline import make_tracer, render_rays

    soft = mode == "fwd_bwd"
    rkw = dict(soft=True, k_layers=4, sharpness=40.0, band=0.08, k_occ=8)

    t0 = time.perf_counter()
    tracer = make_tracer(scene, method=method, band=rkw["band"] if soft else 0.0)
    _sync(tracer.bvh.flat_lo if tracer.bvh is not None else scene.tris.verts)
    build_s = time.perf_counter() - t0
    engine = resolve_engine(method, tracer)
    log(f"bvh build+pack: {build_s:.2f}s  engine_ran={engine}")

    rays = gen_primary_rays(cam)
    o = rays.o.reshape(-1, 3)
    d = rays.d.reshape(-1, 3)
    if ray_order == "morton":
        # Z-order pixels -> each packet is a compact screen tile, not a thin
        # scanline strip (SURVEY §7 #10); static permutation, one gather.
        perm, _ = pixel_morton_perm(cam.height, cam.width)
        o, d = o[perm], d[perm]
    n = min(bench_rays, o.shape[0])
    o, d = o[:n], d[:n]

    if mode == "fwd":
        fn = jax.jit(lambda tr, o, d: render_rays(tr, Rays(o=o, d=d)))
        args = (tracer, o, d)
    else:
        # The honest fit-step shape (VERDICT r3 #5): differentiate BOTH
        # named parameters (verts + albedo, BASELINE.md:23), refit the BVH
        # inside the timed step exactly like api/inverse does every step,
        # and cover the ray batch with a scan over <=256K-ray chunks so the
        # full frame is timed, not a fraction of it.
        if method == "pallas8" and tracer.bvh is not None:
            # the BVH8 fit path reads only (first/last/order/boxes); drop
            # the binary engines' arrays (~450 MB at 5M) — the effective
            # single-client HBM budget through this environment is ~4 GB
            tracer = tracer.replace(bvh=tracer.bvh.slim_for_wide(),
                                    packed=None)
        chunk = min(131072 if scene.tris.num_tris >= 2_000_000 else 262144, n)
        n_pad = (-n) % chunk
        o_p = jnp.pad(o, ((0, n_pad), (0, 0)))
        d_p = jnp.pad(d, ((0, n_pad), (0, 0)))
        n_chunks = o_p.shape[0] // chunk
        o_c = o_p.reshape(n_chunks, chunk, 3)
        d_c = d_p.reshape(n_chunks, chunk, 3)

        # TABLE-SPACE gradient accumulation: after the round-4 restructure
        # ALL vertex/albedo dependence of the soft render flows through the
        # (T, 15) tri_table, so each ray chunk's VJP can stop at a DENSE
        # table cotangent (one (T, 15) add per chunk, bounded residual
        # memory, no remat double-forward) and the verts-level sorted
        # segment-sum runs ONCE per step.  Each piece is its own jit; the
        # python chunk loop dispatches asynchronously and only the final
        # readback syncs.
        from tpurt.accel.refit import refit_aabbs
        from tpurt.render.pipeline import tri_table

        needs_flat = method in ("bvh", "wave", "packet", "pallas")

        @jax.jit
        def prep(tr, verts, albedo, table):
            # table: the step's differentiable (T, 15) tri_table — reused
            # (stop-grad) for the wide row repack, which is ~3x cheaper
            # than regathering vertices (rows_from_table, docs/PERF.md r5)
            sc = tr.scene.replace(tris=tr.scene.tris.replace(
                verts=verts, albedo=albedo))
            bvh, packed, wide = tr.bvh, tr.packed, tr.wide
            if wide is not None and packed is None and not needs_flat:
                # pure-BVH8 path: fold entry boxes up the wide topology
                # directly — no binary node RMQ at all (refit_wide_direct;
                # the step's bvh keeps stale boxes, nothing reads them)
                from tpurt.accel.bvh8 import refit_wide_direct

                wide = refit_wide_direct(
                    wide, jax.lax.stop_gradient(sc.tris),
                    table=jax.lax.stop_gradient(table))
            elif bvh is not None:
                bvh = refit_aabbs(bvh, jax.lax.stop_gradient(sc.tris),
                                  update_flat=needs_flat)
                if packed is not None:
                    from tpurt.accel.packet import refit_packed

                    packed = refit_packed(packed, bvh,
                                          jax.lax.stop_gradient(sc.tris))
                if wide is not None:
                    from tpurt.accel.bvh8 import refit_wide

                    wide = refit_wide(wide, bvh,
                                      jax.lax.stop_gradient(sc.tris),
                                      table=jax.lax.stop_gradient(table))
            return tr.replace(scene=sc, bvh=bvh, packed=packed, wide=wide)

        def _table_of(tr, verts, albedo):
            return tri_table(tr.scene.tris.replace(verts=verts, albedo=albedo))

        @jax.jit
        def table_fwd(tr, verts, albedo):
            return _table_of(tr, verts, albedo)

        @jax.jit
        def chunk_vjp(tr, table, oc, dc):
            def closs(tb):
                colors = render_rays(tr.replace(table=tb),
                                     Rays(o=oc, d=dc), **rkw)
                return jnp.sum(colors * colors)

            loss_c, vjp = jax.vjp(closs, table)
            return loss_c, vjp(jnp.float32(1.0))[0]

        @jax.jit
        def table_bwd(tr, verts, albedo, tcot):
            _, vjp = jax.vjp(lambda v, a: _table_of(tr, v, a), verts, albedo)
            gv, ga = vjp(tcot)
            return {"verts": gv, "albedo": ga}

        @jax.jit
        def acc(a, b):
            return a + b

        def fn(tr, o_c, d_c):
            verts = tr.scene.tris.verts
            albedo = tr.scene.tris.albedo
            table = table_fwd(tr, verts, albedo)
            tr2 = prep(tr, verts, albedo, table)
            tcot = None
            for i in range(n_chunks):
                _, tc = chunk_vjp(tr2, table, o_c[i], d_c[i])
                tcot = tc if tcot is None else acc(tcot, tc)
            return table_bwd(tr, verts, albedo, tcot)

        args = (tracer, o_c, d_c)

    rays_per_s, ms, compile_s = _bench_chunk(fn, args, n, iters, warmup,
                                             profile_dir=profile_dir)
    log(f"{method}/{mode}: compile {compile_s:.1f}s, {ms:.2f} ms / {n} rays "
        f"= {rays_per_s/1e6:.2f}M rays/s")
    return {
        "rays_per_s": rays_per_s,
        "engine_ran": engine,
        "bench_rays": n,
        "build_s": round(build_s, 3),
        "compile_s": round(compile_s, 2),
        "ms_per_call": round(ms, 3),
    }


FALLBACK_CHAIN = ["pallas8", "pallas", "packet", "wave", "bvh", "brute"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="sponza")
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1088)
    ap.add_argument(
        "--method", default="auto",
        help="auto|pallas8|pallas|packet|wave|bvh|brute (auto = best available)",
    )
    ap.add_argument("--mode", default="both",
                    choices=["fwd", "fwd_bwd", "both"],
                    help="both (default) measures fwd AND fwd_bwd and emits "
                         "them in the one JSON line (BASELINE.json:5 mandates "
                         "both; the driver runs plain `python bench.py`)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--bench-rays", type=int, default=4_194_304,
                    help="cap on rays timed per call; the default covers "
                         "whole frames (a partial morton chunk is a compact "
                         "screen region whose difficulty is not "
                         "representative — measured 13.9M vs 42.1M rays/s "
                         "chunk vs full frame at 1M tris)")
    ap.add_argument("--ray-order", default="morton", choices=["morton", "scan"],
                    help="bench-chunk ray order: Z-order screen tiles "
                         "(coherent packets) or raw scanline")
    ap.add_argument("--staged", action="store_true",
                    help="also run BASELINE.md staged configs 1-3 (rows on stderr)")
    ap.add_argument("--platform", default="auto", choices=["auto", "cpu", "tpu"],
                    help="cpu forces the CPU backend in-process (the "
                         "JAX_PLATFORMS env var is pre-empted by sitecustomize)")
    ap.add_argument("--pallas-parity", action="store_true",
                    help="run the Pallas kernels AND the packet oracle on "
                         "this backend and report the mismatch fraction "
                         "(on-hardware parity smoke, VERDICT #9 — interpret-"
                         "mode-only testing let a Mosaic compile failure "
                         "ship in round 1)")
    ap.add_argument("--sort-bench", action="store_true",
                    help="benchmark Pallas radix sort vs lax.sort at 1M/5M "
                         "keys (rows on stderr; SURVEY §7 '#6 decide by "
                         "benchmark')")
    ap.add_argument("--skip-5m", action="store_true",
                    help="skip the 5M-triangle 4K config row (BASELINE "
                         "config 5, single-chip part; runs by default on "
                         "TPU with the default scene)")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler trace of the timed region "
                         "into this directory (overlap evidence, VERDICT #5)")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    modes = ["fwd", "fwd_bwd"] if args.mode == "both" else [args.mode]
    metric = f"primary_rays_per_s_per_chip_{modes[0]}"
    row = {"metric": metric, "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0}

    try:
        _enable_compile_cache()
        import jax

        from tpurt.core.scene import get_scene

        dev = jax.devices()[0]
        log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
        if not timing_sane():
            row["timing_suspect"] = True
            log("WARNING: completion events look broken; wall-clock numbers "
                "below are NOT trustworthy (timing_suspect=true)")

        kw = {}
        if args.scene == "sponza":
            kw = dict(num_tris=args.tris, width=args.width, height=args.height)
        scene, cam = get_scene(args.scene, **kw)
        log(f"scene={args.scene} tris={scene.tris.num_tris} "
            f"frame_rays={cam.num_pixels} bench_rays<={args.bench_rays}")

        if args.method == "auto":
            chain = [m for m in FALLBACK_CHAIN
                     if dev.platform != "cpu" or m not in ("pallas8", "pallas")]
        else:
            chain = [args.method]

        result, used = None, None
        for m in chain:
            try:
                result = run_one(scene, cam, m, modes[0],
                                 args.bench_rays, args.iters, args.warmup,
                                 profile_dir=args.profile_dir,
                                 ray_order=args.ray_order)
                used = m
                break
            except Exception as e:  # degrade to the next engine, keep going
                log(f"method {m} failed: {type(e).__name__}: {e}")
        if result is None:
            raise RuntimeError(f"all methods failed: {chain}")

        row.update(
            value=result["rays_per_s"],
            vs_baseline=result["rays_per_s"] / BASELINE_RAYS_PER_S,
            method=used,
            engine_ran=result["engine_ran"],
            scene=args.scene,
            tris=int(scene.tris.num_tris),
            bench_rays=result["bench_rays"],
            build_s=result["build_s"],
            compile_s=result["compile_s"],
        )

        if len(modes) > 1:  # default: the second mandated metric, same row
            res2 = used2 = None
            # fwd_bwd covers the FULL frame via a scan over 256K-ray chunks
            # (run_one mode='fwd_bwd'); if the full-frame grad step fails
            # (compile/memory), fall back to one chunk before falling back
            # to a slower engine.
            for m in [used] + [x for x in chain if x != used]:
                for bwd_rays in dict.fromkeys(
                        [min(args.bench_rays, cam.num_pixels), 262144]):
                    try:
                        res2 = run_one(scene, cam, m, "fwd_bwd",
                                       bwd_rays, args.iters, args.warmup,
                                       ray_order=args.ray_order)
                        used2 = m
                        break
                    except Exception as e:
                        log(f"fwd_bwd method {m}@{bwd_rays} failed: "
                            f"{type(e).__name__}: {e}")
                if res2 is not None:
                    break
            if res2 is not None:
                row.update(
                    value_fwd_bwd=res2["rays_per_s"],
                    vs_baseline_fwd_bwd=res2["rays_per_s"] / BASELINE_RAYS_PER_S,
                    method_fwd_bwd=used2,
                    engine_ran_fwd_bwd=res2["engine_ran"],
                    ms_per_call_fwd_bwd=res2["ms_per_call"],
                    bench_rays_fwd_bwd=res2["bench_rays"],
                    grad_params="verts+albedo",
                )
            else:
                row["fwd_bwd_error"] = "all methods failed"

        if (not args.skip_5m and args.scene == "sponza"
                and dev.platform != "cpu"):
            _run_5m(args, row)
        if args.staged:
            _run_staged(args)
        if args.sort_bench:
            _run_sort_bench()
        if args.pallas_parity:
            _run_pallas_parity()
    except Exception as e:
        log(f"FATAL: {type(e).__name__}: {e}")
        row["error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(row), flush=True)


def _run_5m(args, row: dict) -> None:
    """BASELINE config 5, single-chip part (BASELINE.json:11): build the 5M-
    triangle scene and render one full 4K frame through the BVH8 HBM tier.
    Emits its own JSON row on STDOUT (before the headline line, which stays
    last for the driver's parser) and mirrors the numbers into the headline
    row as *_5m keys."""
    try:
        from tpurt.core.scene import get_scene

        scene, cam = get_scene("sponza5m")
        log(f"5M config: tris={scene.tris.num_tris} frame={cam.num_pixels}")
        res = run_one(scene, cam, "pallas8", "fwd", cam.num_pixels,
                      iters=2, warmup=1, ray_order=args.ray_order)
        print(json.dumps({
            "metric": "primary_rays_per_s_per_chip_fwd",
            "value": res["rays_per_s"], "unit": "rays/s",
            "vs_baseline": res["rays_per_s"] / BASELINE_RAYS_PER_S,
            "scene": "sponza5m", "tris": int(scene.tris.num_tris),
            "width": cam.width, "height": cam.height,
            "method": "pallas8", "engine_ran": res["engine_ran"],
            "bench_rays": res["bench_rays"], "build_s": res["build_s"],
            "compile_s": res["compile_s"],
            "ms_per_frame": res["ms_per_call"],
        }), flush=True)
        row.update(value_5m=res["rays_per_s"], tris_5m=int(scene.tris.num_tris),
                   ms_per_frame_5m=res["ms_per_call"],
                   build_s_5m=res["build_s"], engine_ran_5m=res["engine_ran"])

        # fwd_bwd at the 5M point too: BASELINE.json:5 mandates BOTH
        # directions at every measurement config (VERDICT r4 missing #5).
        # Full 4K frame via the same chunked fit-step shape as the 1M row.
        try:
            res_b = run_one(scene, cam, "pallas8", "fwd_bwd", cam.num_pixels,
                            iters=1, warmup=1, ray_order=args.ray_order)
            print(json.dumps({
                "metric": "primary_rays_per_s_per_chip_fwd_bwd",
                "value": res_b["rays_per_s"], "unit": "rays/s",
                "vs_baseline": res_b["rays_per_s"] / BASELINE_RAYS_PER_S,
                "scene": "sponza5m", "tris": int(scene.tris.num_tris),
                "method": "pallas8", "engine_ran": res_b["engine_ran"],
                "bench_rays": res_b["bench_rays"],
                "ms_per_frame": res_b["ms_per_call"],
                "grad_params": "verts+albedo",
            }), flush=True)
            row.update(value_5m_fwd_bwd=res_b["rays_per_s"],
                       ms_per_frame_5m_fwd_bwd=res_b["ms_per_call"])
        except Exception as e:
            log(f"5M fwd_bwd failed: {type(e).__name__}: {e}")
            row["error_5m_fwd_bwd"] = f"{type(e).__name__}: {e}"[:200]

        # Partitioned-scene fwd at 5M through the API ring path (degenerate
        # n_parts = 1 on the single real chip): the production BVH8 kernel
        # running on a per-partition WideBVH — the structure a pod shards
        # across devices (VERDICT r4 missing #4's measurement half).
        try:
            _run_5m_partitioned(args, row, scene, cam)
        except Exception as e:
            log(f"5M partitioned failed: {type(e).__name__}: {e}")
            row["error_5m_ring"] = f"{type(e).__name__}: {e}"[:200]
    except Exception as e:
        log(f"5M config failed: {type(e).__name__}: {e}")
        row["error_5m"] = f"{type(e).__name__}: {e}"[:200]


def _run_5m_partitioned(args, row: dict, scene, cam) -> None:
    import jax
    import numpy as np

    from jax.sharding import Mesh

    from tpurt.core.geometry import Rays
    from tpurt.render.camera import gen_primary_rays, pixel_morton_perm
    from tpurt.render.pipeline import make_tracer, render_rays

    mesh = Mesh(np.array(jax.devices()[:1]), ("rays",))
    t0 = time.perf_counter()
    tracer = make_tracer(scene, "ring", mesh=mesh)
    _sync(tracer.pbvh.wrow)
    build_s = time.perf_counter() - t0
    rays = gen_primary_rays(cam)
    perm, _ = pixel_morton_perm(cam.height, cam.width)
    o = rays.o.reshape(-1, 3)[perm]
    d = rays.d.reshape(-1, 3)[perm]
    n = o.shape[0]
    fn = jax.jit(lambda tr, o, d: render_rays(tr, Rays(o=o, d=d)))
    rps, ms, compile_s = _bench_chunk(fn, (tracer, o, d), n, 2, 1)
    log(f"5M ring(1-part, wide): build {build_s:.1f}s, {ms:.1f} ms/frame "
        f"= {rps/1e6:.2f}M rays/s")
    print(json.dumps({
        "metric": "primary_rays_per_s_per_chip_fwd",
        "value": rps, "unit": "rays/s",
        "vs_baseline": rps / BASELINE_RAYS_PER_S,
        "scene": "sponza5m", "tris": int(scene.tris.num_tris),
        "method": "ring(pallas8, n_parts=1)", "engine_ran": "ring+pallas8",
        "bench_rays": n, "build_s": round(build_s, 2),
        "compile_s": round(compile_s, 2), "ms_per_frame": round(ms, 2),
    }), flush=True)
    row.update(value_5m_ring=rps, ms_per_frame_5m_ring=round(ms, 2))


def _run_pallas_parity() -> None:
    """EVERY Pallas kernel tier vs the packet oracle ON THIS BACKEND (the
    real chip when run there): closest/occlusion/k-nearest mismatch counts
    for the binary ('pallas') and wide ('pallas8') engines in both their
    VMEM-resident and forced-HBM-triangle tiers.  Interpret-mode-only tier
    testing let Mosaic compile failures ship in BOTH prior rounds (VERDICT
    r1 weak #2, r2 weak #3) — here each tier must compile and agree on
    hardware on every bench invocation.  Small mismatch counts are expected
    (FMA contraction flips exact-boundary rays and near-tie k-list order);
    anything beyond ~1e-3 or a compile error fails the row."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    import tpurt.kernels.traverse as kt
    import tpurt.kernels.traverse8 as k8
    from tpurt.core.geometry import Rays
    from tpurt.core.scene import get_scene
    from tpurt.render.camera import gen_primary_rays
    from tpurt.render.pipeline import make_tracer

    scene, cam = get_scene("cornell")
    rays = gen_primary_rays(cam.replace(width=128, height=128))
    rays = Rays(o=rays.o.reshape(-1, 3), d=rays.d.reshape(-1, 3))
    n = rays.o.shape[0]
    tmax = jnp.full((n,), 5.0, jnp.float32)

    def eval_tracer(tr):
        h = jax.block_until_ready(
            jax.jit(lambda o, d: tr.closest(Rays(o=o, d=d)))(rays.o, rays.d))
        occ = jax.jit(lambda o, d: tr.visibility(
            Rays(o=o, d=d), tmax, False, 0.0, 0.0))(rays.o, rays.d)
        kn = jax.jit(lambda o, d: tr.k_nearest(
            Rays(o=o, d=d), 4, 0.0))(rays.o, rays.d)
        return (np.asarray(h.tri), np.asarray(occ), np.asarray(kn.tri))

    ref = eval_tracer(make_tracer(scene, method="packet"))
    tr_p = make_tracer(scene, method="pallas")
    tr_w = make_tracer(scene, method="pallas8")
    # budget override that forces the BVH8 engine's HBM-triangle tier; the
    # binary engine is VMEM-only by design (its HBM tier failed Mosaic
    # compile on hardware and was retired, kernels/traverse._plan)
    hbm_budget = {
        "pallas8": k8.wide_bytes(tr_w.wide) + k8._SCRATCH_HEADROOM + 64,
    }
    tol = max(4, n // 1000)
    failures = []
    for engine, tr, mod in (("pallas", tr_p, kt), ("pallas8", tr_w, k8)):
        for tier in ("vmem",) if engine == "pallas" else ("vmem", "hbm"):
            saved = mod.VMEM_BUDGET_BYTES
            if tier == "hbm":
                mod.VMEM_BUDGET_BYTES = hbm_budget[engine]
            try:
                jax.clear_caches()  # budget is baked into traced kernels
                got = eval_tracer(tr)
                tri_mm = int((got[0] != ref[0]).sum())
                occ_mm = int((got[1] != ref[1]).sum())
                kn_set = int((np.sort(got[2], -1) != np.sort(ref[2], -1))
                             .any(-1).sum())
                ok = max(tri_mm, occ_mm, kn_set) <= tol
                row = {
                    "pallas_parity": jax.default_backend(), "engine": engine,
                    "tier": tier, "rays": n, "closest_mismatch": tri_mm,
                    "occlusion_mismatch": occ_mm, "knearest_set_mismatch":
                    kn_set, "ok": bool(ok),
                }
            except Exception as e:
                row = {"pallas_parity": jax.default_backend(),
                       "engine": engine, "tier": tier, "ok": False,
                       "error": f"{type(e).__name__}: {e}"[:300]}
            finally:
                mod.VMEM_BUDGET_BYTES = saved
            print(json.dumps(row), file=sys.stderr, flush=True)
            if not row["ok"]:
                failures.append(f"{engine}/{tier}")
    if failures:
        raise RuntimeError(f"pallas parity failure: {failures}")


def _run_sort_bench() -> None:
    """Pallas radix sort vs XLA lax.sort_key_val: the measurement that picks
    sort_pairs' default backend (SURVEY §7 '#6')."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpurt.accel.sort_ref import sort_pairs

    rng = np.random.default_rng(0)
    # interpret-mode Pallas on CPU is a correctness tool, not a benchmark —
    # keep the CPU smoke tiny; real sizes run on the chip
    sizes = (1 << 20, 5 << 20) if jax.default_backend() != "cpu" else (1 << 14,)
    for n in sizes:
        keys = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
        vals = jnp.arange(n, dtype=jnp.int32)
        for backend in ("xla",):  # pallas sort retired: docs/RETIRED.md
            try:
                f = jax.jit(lambda k, v, b=backend: sort_pairs(k, v, backend=b))
                t0 = time.perf_counter()
                out = f(keys, vals)
                _sync(out)
                comp = max(time.perf_counter() - t0 - _READBACK_LAT_S, 0.0)
                t0 = time.perf_counter()
                iters = 5
                for _ in range(iters):
                    out = f(keys, vals)
                _sync(out)
                dt = (time.perf_counter() - t0 - _READBACK_LAT_S) / iters
                print(json.dumps({
                    "sort_bench": backend, "keys": n,
                    "ms": round(dt * 1e3, 3),
                    "mkeys_per_s": round(n / dt / 1e6, 1),
                    "compile_s": round(comp, 2),
                }), file=sys.stderr, flush=True)
            except Exception as e:
                log(f"sort bench {backend}@{n} failed: {e}")


def _run_staged(args) -> None:
    """BASELINE.md staged configs 1-3; one row each on stderr."""
    from tpurt.core.scene import get_scene

    configs = [
        ("1-cornell", "cornell", {}, min(256 * 256, args.bench_rays)),
        ("2-bunny", "bunny", {}, min(512 * 512, args.bench_rays)),
        ("3-sponza1m", "sponza", dict(num_tris=1_000_000, width=1920, height=1088),
         args.bench_rays),
    ]
    for name, sc_name, kw, nrays in configs:
        for mode in ("fwd", "fwd_bwd"):
            try:
                scene, cam = get_scene(sc_name, **kw)
                chain = [args.method] if args.method != "auto" else FALLBACK_CHAIN
                for m in chain:
                    try:
                        r = run_one(scene, cam, m, mode, nrays, args.iters,
                                    args.warmup)
                        print(json.dumps({
                            "staged_config": name, "mode": mode, "method": m,
                            **r,
                        }), file=sys.stderr, flush=True)
                        break
                    except Exception as e:
                        log(f"staged {name}/{mode}/{m} failed: {e}")
            except Exception as e:
                log(f"staged {name}/{mode} failed entirely: {e}")
    _run_fit_staged()


def _run_fit_staged() -> None:
    """BASELINE config 4: inverse-rendering fit throughput (steps/s and
    effective fwd+bwd rays/s) on a small frame."""
    try:
        import jax

        from tpurt.api.config import FitConfig, RenderConfig
        from tpurt.api.inverse import InverseRenderer
        from tpurt.core.scene import get_scene
        from tpurt.render.pipeline import render

        scene, cam = get_scene("cornell")
        cam = cam.replace(width=64, height=64)
        rkw = dict(method="bvh", soft=True, k_layers=4, sharpness=40.0,
                   band=0.08)
        target = render(scene, cam, **rkw)
        perturbed = scene.replace(
            tris=scene.tris.replace(verts=scene.tris.verts * 1.02))
        inv = InverseRenderer(
            perturbed, cam,
            fit=FitConfig(steps=6, lr=1e-3, grad_chunks=2),
            render=RenderConfig(**rkw),
        )
        t0 = time.perf_counter()
        res = inv.fit(target, steps=1)  # compile + first step
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = inv.fit(target, steps=5)
        dt = (time.perf_counter() - t0) / 5
        print(json.dumps({
            "staged_config": "4-fit", "steps_per_s": round(1.0 / dt, 3),
            "rays_per_s_fwd_bwd_equiv": round(cam.num_pixels / dt, 1),
            "compile_s": round(compile_s, 1),
            "final_loss": res.losses[-1],
        }), file=sys.stderr, flush=True)
    except Exception as e:
        log(f"staged 4-fit failed: {e}")


if __name__ == "__main__":
    main()
