"""BVH vs dense-sweep intersection scaling in triangle count (round 4).

The dense [T, N] sweep is O(T) per ray; the BVH walk should be ~O(log T).
This records both across cornell-stress sizes (38 tris .. ~100k tris) at a
fixed 262144-ray batch -- the sublinear-scaling evidence for the BVH arm
(round-3 verdict item 1) and the data behind the 'auto' dispatch crossover.

Usage: python tools/bench_bvh_micro.py [out.json] [--rays N]
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
# boxes -> tris = 38 + 10 * boxes (+1 sphere per 20 boxes to keep the mixed
# primitive path exercised without dominating)
SIZES = [0, 100, 1000, 5000, 10000]
RESULTS = []


def scene_for(boxes: int):
    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    cfg = RenderConfig(
        scene="cornell-stress" if boxes else "cornell",
        mode="rgb",
        stress_boxes=boxes,
        stress_spheres=max(boxes // 20, 0),
        # force a BVH even for small scenes so both impls exist everywhere
        intersect_impl="bvh",
    )
    tables = build_color_tables(cfg)
    t0 = time.time()
    scene = build_scene(cfg, tables)
    build_s = time.time() - t0
    return cfg, scene, build_s


def bench_impl(scene, eps, impl, rtt, k=12):
    from simple_spectral_tpu.render.bvh import intersect_rays_bvh
    from simple_spectral_tpu.render.intersect import intersect_rays_soa
    from simple_spectral_tpu.render.vec import V3

    rng = np.random.default_rng(0)
    o_np = rng.uniform((20, 20, 20), (530, 530, 530), (N_RAYS, 3)).astype(np.float32)
    d_np = rng.normal(size=(N_RAYS, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=1, keepdims=True)
    o0 = jnp.asarray(o_np)
    d0 = jnp.asarray(d_np)
    ignore = jnp.full((N_RAYS,), -1, jnp.int32)
    fn = intersect_rays_bvh if impl == "bvh" else intersect_rays_soa

    @jax.jit
    def step(tok):
        # chain: xor the token into one origin component's bits (zero at
        # runtime, defeats memoization)
        ox = o0[:, 0] + tok.astype(jnp.float32) * 1e-30
        o = V3(ox, o0[:, 1], o0[:, 2])
        d = V3(d0[:, 0], d0[:, 1], d0[:, 2])
        rec = fn(scene, o, d, ignore, eps)
        return (jnp.sum(jnp.where(rec.hit, rec.dist, 0.0)) * 1e-30).astype(jnp.int32)

    dt = timeit_chained(f"{impl}", lambda s, i: step(s), jnp.int32(0),
                        K=k, rtt=rtt, quiet=True)
    return dt


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)
    for boxes in SIZES:
        cfg, scene, build_s = scene_for(boxes)
        n_prims = scene.n_tris + scene.n_spheres
        row = {"boxes": boxes, "tris": scene.n_tris, "spheres": scene.n_spheres,
               "bvh_entries": scene.n_bvh_entries,
               "bvh_build_host_s": round(build_s, 2), "rays": N_RAYS}
        dt_b = bench_impl(scene, cfg.eps, "bvh", rtt)
        row["bvh_ms"] = round(dt_b * 1e3, 3)
        row["bvh_mrays_s"] = round(N_RAYS / dt_b / 1e6, 1)
        if n_prims <= 20000:  # dense sweep OOMs/crawls past this
            dt_x = bench_impl(scene, cfg.eps, "xla", rtt)
            row["xla_ms"] = round(dt_x * 1e3, 3)
            row["xla_mrays_s"] = round(N_RAYS / dt_x / 1e6, 1)
        RESULTS.append(row)
        print(row, flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"device": str(jax.devices()[0]),
                       "rtt_ms": round(rtt * 1e3, 2),
                       "note": "random incoherent rays inside the cornell "
                               "volume; per-sweep closest-hit with attrs",
                       "results": RESULTS}, f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
