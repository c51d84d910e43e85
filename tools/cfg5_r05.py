"""BASELINE config 5 end-to-end (round-5 VERDICT item 3): cornell-srgb
1024x1024 @ 256 spp, all four color pipelines, through
render_accumulate_sharded.

Two parts:

1. ``tpu`` (default): the full-size render on the real single-chip TPU mesh
   (dp=1, the largest mesh this environment has) -- wall time, Mrays/s,
   chunk count, and basic image statistics per mode.  This is the config
   the multi-host chunk loop was designed for; multi-chip hardware does not
   exist here, so the sharded program runs on a 1-device mesh (the same
   program the dryrun validates at dp=4 x sp=2 on the virtual CPU mesh).
2. ``cpu``: correctness at reduced spp on the virtual 8-device CPU mesh --
   the SAME 1024^2 frame geometry through the sharded chunk loop (dp=8),
   asserted against the unsharded renderer.

Usage:
  python tools/cfg5_r05.py out.json [tpu|cpu|all]  (cpu forces JAX cpu mesh)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {"configs": []}
OUT = sys.argv[1] if len(sys.argv) > 1 else None
WHICH = sys.argv[2] if len(sys.argv) > 2 else "all"


def flush():
    if OUT:
        with open(OUT, "w") as f:
            json.dump(RESULTS, f, indent=1)


def run_tpu():
    import jax
    import numpy as np

    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.parallel.sharding import (
        make_mesh,
        render_accumulate_sharded,
    )
    from simple_spectral_tpu.render.renderer import render_chunk_lanes
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    RESULTS["device"] = str(jax.devices()[0])
    mesh = make_mesh()
    for mode in ("rgb", "mallett", "meng", "jakob"):
        cfg = RenderConfig(scene="cornell-srgb", mode=mode,
                           width=1024, height=1024, spp=256)
        tables = build_color_tables(cfg)
        scene = build_scene(cfg, tables)
        n_px = cfg.width * cfg.height
        chunk = min(n_px, render_chunk_lanes(cfg, scene) * mesh.shape["dp"])
        n_chunks = -(-n_px // chunk)
        t0 = time.time()
        value, alpha = render_accumulate_sharded(cfg, scene, tables, mesh)
        wall = time.time() - t0
        rays = float(n_px) * cfg.spp * (2 * cfg.max_depth - 1)
        row = {
            "mode": mode, "width": cfg.width, "spp": cfg.spp,
            "mesh": dict(mesh.shape), "chunk_px": int(chunk),
            "n_chunks": int(n_chunks),
            "wall_s": round(wall, 1),
            "mrays_s": round(rays / wall / 1e6, 1),
            "value_mean": [round(float(m), 4) for m in value.mean(axis=(0, 1))],
            "alpha_mean": round(float(alpha.mean()), 4),
        }
        RESULTS["configs"].append(row)
        print(row, flush=True)
        flush()


def run_cpu():
    # XLA_FLAGS is read at first backend init (not jax import), so setting
    # it here still works; jax_platforms must go through jax.config (the
    # sitecustomize imported jax already -- see tests/conftest.py).
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.parallel.sharding import (
        make_mesh,
        render_accumulate_sharded,
    )
    from simple_spectral_tpu.render.renderer import render_accumulate

    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    # full cfg5 frame geometry (1024^2 -> multiple chunks through the
    # sharded loop), reduced spp so the 2-core CPU host finishes
    cfg = RenderConfig(scene="cornell-srgb", mode="mallett",
                       width=1024, height=1024, spp=2,
                       max_lanes=1 << 18)  # force a multi-chunk loop
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    mesh = make_mesh(dp=8)
    t0 = time.time()
    v_sh, a_sh = render_accumulate_sharded(cfg, scene, tables, mesh, seed=5)
    sh_s = time.time() - t0
    # NOTE: the sharded RNG streams fold in the dp shard index, so sharded
    # and unsharded renders are different MC estimates of the same image;
    # assert statistical agreement of the means (the exact-equality check
    # lives in __graft_entry__.dryrun_multichip's emulation comparison).
    v_un, a_un = render_accumulate(cfg, scene, tables, seed=5)
    dm = abs(v_sh.mean() - v_un.mean()) / max(abs(v_un.mean()), 1e-9)
    da = abs(a_sh.mean() - a_un.mean())
    row = {
        "check": "cpu dp=8 sharded chunk loop vs unsharded, 1024^2 @ 2 spp",
        "n_chunks": int(-(-1024 * 1024 // ((1 << 18) * 8))),
        "sharded_wall_s": round(sh_s, 1),
        "mean_rel_diff": float(dm), "alpha_mean_diff": float(da),
        "pass": bool(dm < 0.02 and da < 0.01),
    }
    RESULTS["cpu_check"] = row
    print(row, flush=True)
    flush()
    assert row["pass"], row


def main():
    # jax cannot switch platforms after first init: run "tpu" and "cpu" as
    # separate invocations against the same OUT (merged here).
    global RESULTS
    if OUT and os.path.exists(OUT):
        with open(OUT) as f:
            RESULTS = json.load(f)
        RESULTS.setdefault("configs", [])
    if WHICH == "all":
        raise SystemExit("run 'tpu' and 'cpu' as separate invocations")
    if WHICH == "tpu":
        run_tpu()
    if WHICH == "cpu":
        run_cpu()
    flush()
    if OUT:
        print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
