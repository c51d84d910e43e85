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
                   help="cornell | cornell-srgb | plane-srgb")
    p.add_argument("-w", "--width", type=int, default=512)
    p.add_argument("-h", "--height", type=int, default=512)
    p.add_argument("-spp", "--spp", type=int, default=64,
                   help="samples per pixel")
    p.add_argument("-o", "--output", default="output.png",
                   help="output path; format by extension: .png .pfm .hdr .csv")
    p.add_argument("--indirect-only", action="store_true",
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
    )
    # replicate the reference's convergence advice (src/renderer.cpp:18-31)
    if cfg.scene.startswith("cornell") and not cfg.els:
        print("Warning: Cornell converges much faster with explicit light sampling!",
              file=sys.stderr)
    if cfg.scene == "plane-srgb" and cfg.els:
        print("Warning: Plane converges much faster without explicit light sampling!",
              file=sys.stderr)

    from simple_spectral_tpu.io.image import save_image
    from simple_spectral_tpu.render.progressive import ProgressiveRenderer

    t0 = time.time()
    pr = ProgressiveRenderer(
        cfg, seed=args.seed, checkpoint_path=args.checkpoint, spp_per_pass=args.pass_spp
    )
    if args.checkpoint and pr.resume():
        print(f"resumed from {args.checkpoint} at {pr.spp_done} spp", file=sys.stderr)
    pr.run(checkpoint_every=args.checkpoint_every, progress=not args.quiet)
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
