"""Block-cull vs dense-sweep intersection at BVH scale (round 4).

The cull arm's win scales with ray-block coherence (render/cull.py): camera
blocks touch a handful of clusters, random blocks degrade toward dense-sweep
work.  This measures both regimes at several scene sizes, against the dense
[T, N] sweep -- producing the committed evidence for the scale path's
crossover and for 'auto' dispatch policy.

Usage: python tools/bench_cull_micro.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_bench import measure_rtt, timeit_chained

N_RAYS = 262144
SIZES = [1000, 5000, 10000]  # stress boxes -> ~10k / 50k / 100k tris
RESULTS = []
OUT_PATH = None


def _flush():
    if OUT_PATH:
        with open(OUT_PATH, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "rays": N_RAYS,
                       "results": RESULTS}, f, indent=1)


def scene_for(boxes: int):
    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    cfg = RenderConfig(
        scene="cornell-stress", mode="rgb", stress_boxes=boxes,
        stress_spheres=boxes // 20, intersect_impl="cull",
    )
    tables = build_color_tables(cfg)
    t0 = time.time()
    scene = build_scene(cfg, tables)
    return cfg, scene, time.time() - t0


def make_rays(scene, cfg, coherent: bool):
    from simple_spectral_tpu.render.integrator import camera_rays_soa
    from simple_spectral_tpu.render.vec import V3

    rng = np.random.default_rng(0)
    if coherent:
        # camera rays through the full pixel grid (the real first sweep)
        px = jnp.arange(N_RAYS, dtype=jnp.int32) % (cfg.width * cfg.height)
        o, d = camera_rays_soa(scene, cfg, jax.random.PRNGKey(1),
                               px % cfg.width, px // cfg.width)
        return jax.block_until_ready(o), d
    o_np = rng.uniform((20, 20, 20), (530, 530, 530), (N_RAYS, 3)).astype(np.float32)
    d_np = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    return (
        V3(*[jnp.asarray(o_np[:, i]) for i in range(3)]),
        V3(*[jnp.asarray(d_np[:, i]) for i in range(3)]),
    )


def bench_impl(scene, eps, impl, o, d, rtt, k=12):
    from simple_spectral_tpu.render.cull import intersect_rays_cull
    from simple_spectral_tpu.render.intersect import intersect_rays_soa
    from simple_spectral_tpu.render.vec import V3

    ignore = jnp.full((N_RAYS,), -1, jnp.int32)
    fn = intersect_rays_cull if impl == "cull" else intersect_rays_soa

    @jax.jit
    def step(tok):
        o2 = V3(o.x + tok.astype(jnp.float32) * 1e-30, o.y, o.z)
        rec = fn(scene, o2, d, ignore, eps)
        return (jnp.sum(jnp.where(rec.hit, rec.dist, 0.0)) * 1e-30).astype(jnp.int32)

    return timeit_chained(impl, lambda s, i: step(s), jnp.int32(0), K=k,
                          rtt=rtt, quiet=True)


def main():
    global OUT_PATH
    OUT_PATH = sys.argv[1] if len(sys.argv) > 1 else None
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)
    for boxes in SIZES:
        cfg, scene, build_s = scene_for(boxes)
        row = {"boxes": boxes, "tris": scene.n_tris, "spheres": scene.n_spheres,
               "clusters": int(scene.cull_tiles.shape[0]),
               "build_host_s": round(build_s, 2)}
        for coh in (True, False):
            o, d = make_rays(scene, cfg, coh)
            tag = "coherent" if coh else "random"
            dt_c = bench_impl(scene, cfg.eps, "cull", o, d, rtt)
            row[f"cull_{tag}_ms"] = round(dt_c * 1e3, 3)
            row[f"cull_{tag}_mrays_s"] = round(N_RAYS / dt_c / 1e6, 1)
            if scene.n_tris <= 60000:
                dt_x = bench_impl(scene, cfg.eps, "xla", o, d, rtt)
                row[f"xla_{tag}_ms"] = round(dt_x * 1e3, 3)
                row[f"xla_{tag}_mrays_s"] = round(N_RAYS / dt_x / 1e6, 1)
        RESULTS.append(row)
        print(row, flush=True)
        _flush()
    _flush()
    if OUT_PATH:
        print(f"wrote {OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()
