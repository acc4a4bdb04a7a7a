"""Command-line renderer: ``python -m mitsuba_tpu scene.xml [...]``.

Parity with the reference CLI (src/mitsuba/mitsuba.cpp:52-86,129-418):
-o output, -D key=value scene defines, -L log level, -z quiet, -x skip
scenes whose output exists, -r sec periodic partial-image flush (the
FlushThread analog, mitsuba.cpp:107-127), -p device count (TPU chips
instead of CPU cores), -j N concurrent scenes (mitsuba.cpp:223-227 P5:
scene load + BVH build + jit compile overlap across a thread pool; device
passes still serialize per chip).
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="mitsuba_tpu",
        description="TPU-native differentiable renderer (Mitsuba 0.6 capability set)",
    )
    ap.add_argument("scenes", nargs="+", help="scene XML file(s)")
    ap.add_argument("-o", "--output", default=None,
                    help="output file (default: scene name + .exr)")
    ap.add_argument("-D", "--define", action="append", default=[],
                    metavar="key=value", help="scene parameter substitution")
    ap.add_argument("-p", "--devices", type=int, default=0,
                    help="number of TPU devices (0 = all available)")
    ap.add_argument("-x", "--skip-existing", action="store_true",
                    help="skip scenes whose output already exists")
    ap.add_argument("-j", "--jobs", type=int, default=1,
                    help="render up to N scenes concurrently (host-side "
                         "load/build/compile overlap)")
    ap.add_argument("-r", "--flush", type=float, default=0.0,
                    help="write partial image every SEC seconds")
    ap.add_argument("-c", "--checkpoint", default="",
                    help="checkpoint file for mid-render resume (.npz); "
                         "resumed renders are bitwise equal to "
                         "uninterrupted ones")
    ap.add_argument("-z", "--quiet", action="store_true")
    ap.add_argument("-L", "--log-level", default="info",
                    choices=["trace", "debug", "info", "warn", "error"])
    ap.add_argument("--spp", type=int, default=0, help="override sample count")
    ap.add_argument("--size", default="", help="override resolution WxH")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    import logging

    from .utils.logging import ProgressReporter, Statistics, get_logger, set_log_level

    set_log_level(getattr(logging, args.log_level.upper(), logging.INFO)
                  if args.log_level != "trace" else 5)
    log = get_logger()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from .io.image import write_image
    from .io.mitsuba_xml import load_scene
    from .render import api, film as film_mod
    from .parallel.shard import make_mesh, render_sharded

    defines = {}
    for d in args.define:
        k, _, v = d.partition("=")
        defines[k] = v

    n_dev = len(jax.devices())
    use_dev = args.devices or n_dev

    def render_one(scene_path):
        out = args.output or os.path.splitext(scene_path)[0] + ".exr"
        ckpt = args.checkpoint
        if ckpt and len(args.scenes) > 1:  # one checkpoint per scene
            base = os.path.splitext(os.path.basename(scene_path))[0]
            ckpt = "%s.%s.npz" % (os.path.splitext(ckpt)[0], base)
        if args.skip_existing and os.path.exists(out):
            log.info("skipping %s (output exists)", scene_path)
            return
        t0 = time.time()
        log.info("loading %s ...", scene_path)
        ls = load_scene(scene_path, defines)
        settings = ls.settings
        if args.spp:
            settings = settings.__class__(**{**settings.__dict__, "spp": args.spp})
        if args.size:
            w, h = (int(x) for x in args.size.lower().split("x"))
            settings = settings.__class__(**{**settings.__dict__,
                                             "width": w, "height": h})
        log.info(
            "rendering %dx%d @ %d spp on %d device(s)",
            settings.width, settings.height, settings.spp, use_dev,
        )

        stats = Statistics.counter("render", "samples")
        progress = ProgressReporter(os.path.basename(scene_path), settings.spp,
                                    quiet=args.quiet)

        # spp-chunked loop with periodic flush (mitsuba.cpp -r semantics)
        import jax.numpy as jnp

        H, W = settings.height, settings.width
        film = film_mod.Film.empty(H, W)
        chunk = min(settings.spp_per_pass, settings.spp)
        last_flush = time.time()

        if use_dev > 1:
            mesh = make_mesh(jax.devices()[:use_dev], dp=use_dev, sp=1)

            from functools import partial
            from .parallel.shard import render_pass_sharded

            def one_pass(film, base, n):
                return render_pass_sharded(
                    ls.scene, ls.static, ls.sensor, ls.integrator, settings,
                    mesh, film, base, n,
                )
        else:
            def one_pass(film, base, n):
                return api.render_pass(
                    ls.scene, ls.static, ls.sensor, ls.integrator, settings,
                    film, base, n,
                )

        jitted = {}

        def run_pass(film, base, n):
            if n not in jitted:
                jitted[n] = jax.jit(lambda f, b: one_pass(f, b, n))
            return jitted[n](film, base)

        s = 0
        if ckpt and os.path.exists(ckpt):
            ck = np.load(ckpt)
            if tuple(ck["shape"]) == (H, W):
                film = film_mod.Film(data=jnp.asarray(ck["film"]))
                s = int(ck["samples"])
                log.info("resumed %s at %d spp", ckpt, s)
        while s < settings.spp:
            n = min(chunk, settings.spp - s)
            film = run_pass(film, jnp.asarray(s, jnp.int32), n)
            s += n
            stats.incr(n * H * W)
            progress.update(s)
            if ckpt:
                tmp = ckpt + ".tmp.npz"
                np.savez(tmp, film=np.asarray(film.data), samples=s,
                         shape=(H, W), seed=settings.seed)
                os.replace(tmp, ckpt)
            if args.flush > 0 and time.time() - last_flush > args.flush:
                write_image(out, np.asarray(film_mod.develop(film)))
                last_flush = time.time()

        img = np.asarray(film_mod.develop(film))
        write_image(out, img)
        log.info("wrote %s (%.1fs)", out, time.time() - t0)
        if not args.quiet:
            Statistics.print_stats()

    if args.jobs > 1 and len(args.scenes) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=args.jobs) as ex:
            futs = [ex.submit(render_one, p) for p in args.scenes]
            errs = []
            for p, fu in zip(args.scenes, futs):
                try:
                    fu.result()
                except Exception as e:  # render the rest; report at exit
                    log.error("scene %s failed: %s", p, e)
                    errs.append(p)
            if errs:
                return 1
    else:
        for scene_path in args.scenes:
            render_one(scene_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
