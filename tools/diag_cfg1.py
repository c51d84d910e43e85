"""Round-4 diagnosis of the cfg1 anomaly (round-3 verdict weak item 1).

BENCH_r03 recorded cfg1 (cornell rgb 128^2, 16384 lanes) at 3.28 Mrays/s --
~95 ms/call for ~311k rays -- while cfg2 (cornell-srgb mallett, 65536 lanes,
strictly MORE work per lane) ran 9 ms/call.  This isolates where the fixed
cost lives by sweeping lane count x {mode, fwd/fwd+bwd, render-only} and
timing the eager per-call key-fold chain.

Usage: python tools/diag_cfg1.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.tpu_bench import measure_rtt, timeit_chained

RESULTS = []


def record(label, dt, rays):
    row = {"label": label, "ms": round(dt * 1e3, 3),
           "mrays_s": round(rays / dt / 1e6, 2)}
    RESULTS.append(row)
    print(f"{label:58s} {dt*1e3:9.2f} ms  {rays/dt/1e6:8.2f} Mrays/s", flush=True)


def main():
    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.render.renderer import _render_chunk
    from simple_spectral_tpu.render.trainstep import (
        forward_backward_step,
        forward_only_step,
    )
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)

    # 0) eager fold_in chain cost (bench.py builds 2 per call eagerly)
    t0 = time.time()
    k = key
    for i in range(64):
        k = jax.random.fold_in(k, i)
    _ = jax.block_until_ready(k)
    dt = (time.time() - t0) / 64
    RESULTS.append({"label": "eager fold_in per op", "ms": round(dt * 1e3, 3)})
    print(f"eager fold_in: {dt*1e3:.3f} ms/op", flush=True)

    configs = {
        "rgb cornell (cfg1 scene)": RenderConfig(
            scene="cornell", mode="rgb", width=128, height=128, spp=8),
        "mallett cornell-srgb": RenderConfig(
            scene="cornell-srgb", mode="mallett", width=128, height=128, spp=8),
    }
    for cname, cfg in configs.items():
        tables = build_color_tables(cfg)
        scene = build_scene(cfg, tables)
        for lanes in (16384, 65536, 262144):
            px = jnp.arange(lanes, dtype=jnp.int32) % (cfg.width * cfg.height)
            target = jnp.zeros((lanes, 3), jnp.float32)
            rays = lanes * (2 * cfg.max_depth - 1)

            def step_fb(state, i, px=px, target=target, cfg=cfg):
                tok = (state[0] * 1e-30).astype(jnp.int32)
                k = jax.random.fold_in(jax.random.fold_in(key, i), tok)
                return forward_backward_step(scene, tables, cfg, k, px, target, 1)

            s0 = step_fb((jnp.float32(0.0),), 0)
            dt = timeit_chained("", step_fb, s0, K=8, rtt=rtt, quiet=True)
            record(f"{cname} fwd+bwd lanes={lanes}", dt, rays)

            def step_f(state, i, px=px, target=target, cfg=cfg):
                tok = (state * 1e-30).astype(jnp.int32)
                k = jax.random.fold_in(jax.random.fold_in(key, i), tok)
                return forward_only_step(scene, tables, cfg, k, px, target, 1)

            s0 = step_f(jnp.float32(0.0), 0)
            dt = timeit_chained("", step_f, s0, K=8, rtt=rtt, quiet=True)
            record(f"{cname} fwd-only lanes={lanes}", dt, rays)

            def step_r(state, i, px=px, cfg=cfg):
                tok = (state[0].ravel()[0] * 1e-30).astype(jnp.int32)
                k = jax.random.fold_in(jax.random.fold_in(key, i), tok)
                return _render_chunk(scene, tables, cfg, k, px, 1)

            s0 = step_r((jnp.zeros((lanes, 3)),), 0)
            dt = timeit_chained("", step_r, s0, K=8, rtt=rtt, quiet=True)
            record(f"{cname} render-only lanes={lanes}", dt, rays)

    if out_path:
        with open(out_path, "w") as f:
            json.dump({"device": str(jax.devices()[0]),
                       "rtt_ms": round(rtt * 1e3, 2), "results": RESULTS},
                      f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
