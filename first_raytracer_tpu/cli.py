"""Command-line driver (SURVEY.md §5.6).

The reference hardcodes ``nx/ny/ns`` and the scene choice in ``main.cpp``;
here every driver workload [BASELINE.json:7-11] is a named preset with
overridable flags.

Examples:
    python -m first_raytracer_tpu.cli render --preset three-spheres \
        --out out/three.png
    python -m first_raytracer_tpu.cli render --preset random-spheres \
        --bvh --spp 10 --out out/final.ppm --checkpoint out/final.ckpt.npz
    python -m first_raytracer_tpu.cli bench --preset random-spheres --bvh
    python -m first_raytracer_tpu.cli occupancy --preset random-spheres --bvh
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def _build(args):
    from .accel.build import build_bvh
    from .scene.builders import build_preset

    kwargs = {}
    if args.nx:
        kwargs["nx"] = args.nx
    if args.ny:
        kwargs["ny"] = args.ny
    if args.spp:
        kwargs["spp"] = args.spp
    scene, camera, cfg = build_preset(args.preset, **kwargs)
    if args.max_depth:
        cfg = dataclasses.replace(cfg, max_depth=args.max_depth)
    accel = build_bvh(scene, max_leaf=4) if args.bvh else None
    return scene, camera, cfg, accel


def _cmd_render(args):
    from .render.image import write_png, write_ppm
    from .render.progressive import progressive_render
    from .render.api import render_image

    scene, camera, cfg, accel = _build(args)
    t0 = time.perf_counter()
    if args.checkpoint:
        img = progressive_render(scene, camera, cfg, seed=args.seed,
                                 accel=accel,
                                 checkpoint_path=args.checkpoint,
                                 samples_per_batch=args.batch_spp)
    elif args.mode == "mega":
        from .kernels.megakernel import render_image_mega
        img = render_image_mega(scene, camera, cfg, seed=args.seed)
    else:
        img = render_image(scene, camera, cfg, seed=args.seed, accel=accel,
                           mode=args.mode)
    dt = time.perf_counter() - t0
    out = args.out or f"{args.preset}.png"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    if out.endswith(".ppm"):
        write_ppm(out, img)
    else:
        write_png(out, img)
    print(f"wrote {out} ({cfg.nx}x{cfg.ny} @ {cfg.spp}spp) in {dt:.2f}s")


def _cmd_bench(args):
    from .core import rng as _rng
    from .render.api import render_ray_batch
    from .utils.profiling import throughput, time_fn
    import jax.numpy as jnp

    scene, camera, cfg, accel = _build(args)
    key = _rng.base_key(args.seed)
    n = min(cfg.num_rays, args.rays or cfg.num_rays)
    ids = jnp.arange(n, dtype=jnp.int32)
    secs = time_fn(render_ray_batch, scene, camera, cfg, key, ids, accel)
    print(json.dumps(throughput(n, 0, secs)))


def _cmd_occupancy(args):
    from .utils.metrics import wavefront_occupancy

    scene, camera, cfg, accel = _build(args)
    print(json.dumps(wavefront_occupancy(scene, camera, cfg,
                                         seed=args.seed, accel=accel),
                     indent=2))


def main(argv=None):
    p = argparse.ArgumentParser(prog="first_raytracer_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [("render", _cmd_render), ("bench", _cmd_bench),
                     ("occupancy", _cmd_occupancy)]:
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        sp.add_argument("--preset", default="three-spheres")
        sp.add_argument("--nx", type=int, default=0)
        sp.add_argument("--ny", type=int, default=0)
        sp.add_argument("--spp", type=int, default=0)
        sp.add_argument("--max-depth", type=int, default=0)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--bvh", action="store_true")
        if name == "render":
            sp.add_argument("--out", default="")
            sp.add_argument("--checkpoint", default="")
            sp.add_argument("--batch-spp", type=int, default=1)
            sp.add_argument(
                "--mode", default="mega",
                choices=("mega", "wavefront", "regenerative"),
                help="mega: persistent-lane Pallas megakernel (fastest); "
                     "wavefront/regenerative: XLA-orchestrated loops "
                     "(support --bvh and gradients)")
        if name == "bench":
            sp.add_argument("--rays", type=int, default=0)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
