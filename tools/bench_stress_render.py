"""End-to-end stress-scene render throughput: cull vs dense, full integrator.

The real sweep mix (coherent camera + semi-coherent shadow + incoherent
bounce rays) decides which intersection arm wins at BVH scale; the micro
benches (tools/cull_micro_r04.json) bracket it with pure-coherent and
pure-random regimes.  Times one _render_chunk call per impl at several
scene sizes.

Usage: python tools/bench_stress_render.py [out.json]
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
OUT_PATH = None


def _flush():
    if OUT_PATH:
        with open(OUT_PATH, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "results": RESULTS},
                      f, indent=1)


def main():
    global OUT_PATH
    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.render.renderer import _render_chunk
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    OUT_PATH = sys.argv[1] if len(sys.argv) > 1 else None
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)
    for boxes in (1000, 5000, 10000):
        cfg0 = RenderConfig(
            scene="cornell-stress", mode="rgb", width=512, height=512,
            stress_boxes=boxes, stress_spheres=boxes // 20,
            intersect_impl="cull", max_depth=10,
        )
        tables = build_color_tables(cfg0)
        scene = build_scene(cfg0, tables)
        lanes = 262144
        px = jnp.arange(lanes, dtype=jnp.int32)
        rays = lanes * (2 * cfg0.max_depth - 2)  # actual sweeps (ELS skip)
        row = {"boxes": boxes, "tris": scene.n_tris,
               "clusters": int(scene.cull_tiles.shape[0])}
        for impl in ("cull", "xla"):
            if impl == "xla" and scene.n_tris > 60000:
                continue  # dense at 100k: ~9 s/call; extrapolate from 50k
            cfg = cfg0.replace(intersect_impl=impl)

            def step(state, i, cfg=cfg):
                tok = (jnp.ravel(state[0])[0] * 1e-30).astype(jnp.int32)
                k = jax.random.fold_in(jax.random.fold_in(key, i), tok)
                return _render_chunk(scene, tables, cfg, k, px, 1)

            s0 = step((jnp.zeros((lanes, 3)),), 0)
            dt = timeit_chained("", step, s0, K=6, rtt=rtt, quiet=True)
            row[f"{impl}_ms"] = round(dt * 1e3, 2)
            row[f"{impl}_mrays_s"] = round(rays / dt / 1e6, 2)
            print(f"boxes={boxes} {impl}: {dt*1e3:.1f} ms "
                  f"({rays/dt/1e6:.2f} Mrays/s)", flush=True)
        RESULTS.append(row)
        _flush()
    if OUT_PATH:
        print(f"wrote {OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()
