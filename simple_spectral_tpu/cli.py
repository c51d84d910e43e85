"""Command-line driver.

Mirrors the reference CLI's flag surface (reference src/main.cpp:33-162) and
adds runtime flags for everything the reference fixes at compile time
(render mode, observer, hero wavelength count, max depth, ELS; reference
src/stdafx.hpp:39-124).
"""

from __future__ import annotations

import argparse
import sys
import time

from simple_spectral_tpu.config import ALL_MODES, RenderConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="simple-spectral-tpu",
        description="TPU-native differentiable spectral path tracer "
        "(capabilities of geometrian/simple-spectral).",
        add_help=False,  # the reference's -h is height (src/main.cpp:44,107)
    )
    p.add_argument("--help", action="help", help="show this message and exit")
    # reference flag surface (src/main.cpp:33-55)
    p.add_argument("-s", "--scene", default="cornell-srgb",
                   help="cornell | cornell-srgb | plane-srgb | cornell-stress")
    p.add_argument("-w", "--width", type=int, default=512)
    p.add_argument("-h", "--height", type=int, default=512)
    p.add_argument("-spp", "--spp", "--samples", type=int, default=64,
                   help="samples per pixel (reference --samples/-spp)")
    p.add_argument("-o", "--output", default="output.png",
                   help="output path; format by extension: .png .pfm .hdr .csv")
    p.add_argument("-io", "--indirect-only", action="store_true",
                   help="render only indirect light (reference src/renderer.hpp:24)")
    # the reference's compile-time tier, now runtime
    p.add_argument("--mode", default="mallett", choices=ALL_MODES,
                   help="color pipeline (reference src/stdafx.hpp:63-93)")
    p.add_argument("--observer", type=int, default=1931, choices=(1931, 2006),
                   help="CIE standard observer (reference src/stdafx.hpp:82-86)")
    p.add_argument("--wavelengths", type=int, default=4,
                   help="hero wavelengths per path (reference SAMPLE_WAVELENGTHS)")
    p.add_argument("--max-depth", type=int, default=10,
                   help="max path depth incl. shadow rays (reference MAX_DEPTH)")
    p.add_argument("--no-els", action="store_true",
                   help="disable explicit light sampling (reference EXPLICIT_LIGHT_SAMPLING)")
    p.add_argument("--no-flat-field", action="store_true",
                   help="disable flat-field correction (reference FLAT_FIELD_CORRECTION)")
    p.add_argument("--seed", type=int, default=0, help="RNG seed")
    p.add_argument("--texture", default="crystal-lizard-512.png",
                   help="texture for the srgb scenes (the reference's 4096^2 "
                   "texture is missing from its own checkout)")
    p.add_argument("--quiet", action="store_true")
    # live preview: the reference's --window GLFW/glDrawPixels loop
    # (src/main.cpp:51-52,271-334), re-shaped for headless TPU hosts as an
    # HTTP frame server (point a browser at it) or an in-terminal ANSI view
    p.add_argument("--window", nargs="?", const="auto", default=None,
                   choices=("auto", "http", "ansi"), metavar="KIND",
                   help="live preview of the accumulating image: http "
                   "(browser, default) or ansi (truecolor terminal)")
    p.add_argument("--window-port", type=int, default=8000,
                   help="port for --window http (0 = ephemeral)")
    # multi-chip / multi-host rendering (parallel/{sharding,multihost}.py)
    p.add_argument("--sp", type=int, default=1, metavar="K",
                   help="sample-parallel mesh axis: split each pixel's spp "
                   "over K devices and psum the partial sums")
    p.add_argument("--sharded", action="store_true",
                   help="render on a dp x sp mesh over ALL local devices "
                   "(single process); implied by --sp > 1 or --coordinator")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host rendering: jax.distributed coordinator "
                   "address (run one process per host)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total process count for --coordinator")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's index for --coordinator")
    p.add_argument("--intersect-impl", default="auto",
                   choices=("auto", "xla", "xla2", "pallas", "bvh", "cull"),
                   help="closest-hit implementation (auto = dense sweep "
                   "below ~32k primitives, block-cull Pallas kernel above; "
                   "bvh = stackless skip-link traversal, kept as the "
                   "semantic reference -- see render/intersect.py)")
    p.add_argument("--stress-boxes", type=int, default=1000,
                   help="cornell-stress: random boxes (10 tris each)")
    p.add_argument("--stress-spheres", type=int, default=500,
                   help="cornell-stress: random spheres")
    p.add_argument("--debug-checks", action="store_true",
                   help="instrument the render with checkify float checks: "
                   "NaN/inf/div-by-zero raise with source location instead "
                   "of corrupting the image (slow; debugging aid)")
    # progressive rendering / checkpointing (no reference analog)
    p.add_argument("--checkpoint", default=None, metavar="PATH",
                   help="accumulate progressively and checkpoint to PATH "
                   "(.npz); resumes automatically if PATH exists")
    p.add_argument("--checkpoint-every", type=int, default=8, metavar="N",
                   help="checkpoint every N passes")
    p.add_argument("--pass-spp", type=int, default=4,
                   help="samples per pixel per progressive pass")
    p.add_argument("--metrics-json", default=None, metavar="PATH",
                   help="write render metrics as one JSON line to PATH ('-' = stdout)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.coordinator or args.num_processes:
        # must run before the first jax backend use (jax.distributed contract)
        from simple_spectral_tpu.parallel.multihost import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)
    cfg = RenderConfig(
        scene=args.scene,
        width=args.width,
        height=args.height,
        spp=args.spp,
        indirect_only=args.indirect_only,
        mode=args.mode,
        observer=args.observer,
        n_wavelengths=args.wavelengths,
        max_depth=args.max_depth,
        els=not args.no_els,
        flat_field=not args.no_flat_field,
        texture=args.texture,
        intersect_impl=args.intersect_impl,
        debug_checks=args.debug_checks,
        stress_boxes=args.stress_boxes,
        stress_spheres=args.stress_spheres,
    )
    # replicate the reference's convergence advice (src/renderer.cpp:18-31)
    if cfg.scene.startswith("cornell") and not cfg.els:
        print("Warning: Cornell converges much faster with explicit light sampling!",
              file=sys.stderr)
    if cfg.scene == "plane-srgb" and cfg.els:
        print("Warning: Plane converges much faster without explicit light sampling!",
              file=sys.stderr)

    from simple_spectral_tpu.io.image import save_image

    multihost = bool(args.coordinator or args.num_processes)
    sharded = args.sharded or args.sp > 1 or multihost
    t0 = time.time()

    if multihost:
        # multi-host render: whole image as one dp x sp sharded accumulation
        # per chunk, all-gathered across hosts (no progressive passes here)
        import jax

        from simple_spectral_tpu.parallel.multihost import (
            render_accumulate_multihost,
        )
        from simple_spectral_tpu.render.renderer import finalize_srgb
        from simple_spectral_tpu.scene.library import build_scene
        from simple_spectral_tpu.spectra.colorimetry import build_color_tables

        tables = build_color_tables(cfg)
        scene = build_scene(cfg, tables)
        value, alpha = render_accumulate_multihost(
            cfg, scene, tables, sp=args.sp, seed=args.seed
        )
        dt = time.time() - t0
        if jax.process_index() == 0:
            save_image(args.output, finalize_srgb(cfg, tables, value, alpha))
        if not args.quiet:
            n_dev = len(jax.devices())
            print(f"rendered {cfg.scene} {cfg.width}x{cfg.height}@{cfg.spp}spp "
                  f"mode={cfg.mode} on {n_dev} devices in {dt:.2f}s -> {args.output}")
        return 0

    from simple_spectral_tpu.render.progressive import ProgressiveRenderer

    mesh = None
    if sharded:
        # single-process mesh parallelism rides the progressive renderer, so
        # --sharded composes with --checkpoint and --window
        from simple_spectral_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(sp=args.sp)
    pr = ProgressiveRenderer(
        cfg, seed=args.seed, checkpoint_path=args.checkpoint,
        spp_per_pass=args.pass_spp, mesh=mesh,
    )
    if args.checkpoint and pr.resume():
        print(f"resumed from {args.checkpoint} at {pr.spp_done} spp", file=sys.stderr)
    preview = on_pass = None
    if args.window:
        from simple_spectral_tpu.io.preview import open_preview

        preview = open_preview(args.window, port=args.window_port, quiet=args.quiet)
        on_pass = lambda p: preview.update(p.image_u8(), p.spp_done, cfg.spp)  # noqa: E731
    try:
        pr.run(checkpoint_every=args.checkpoint_every, progress=not args.quiet,
               on_pass=on_pass)
    finally:
        if preview is not None:
            preview.close()
    dt = time.time() - t0
    fb = pr.image()
    save_image(args.output, fb)
    if not args.quiet:
        m = pr.metrics
        print(f"rendered {cfg.scene} {cfg.width}x{cfg.height}@{pr.spp_done}spp mode={cfg.mode} "
              f"in {dt:.2f}s ({m.mrays_per_s:.2f} Mrays/s) -> {args.output}")
    if args.metrics_json:
        line = pr.metrics.to_json()
        if args.metrics_json == "-":
            print(line)
        else:
            with open(args.metrics_json, "w") as f:
                f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
