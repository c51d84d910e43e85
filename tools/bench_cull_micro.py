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


def parity_check(scene, eps, o, d, n_check=8192, seed=99):
    """Compiled-Mosaic correctness on the real device (round-5 VERDICT item
    2): the cull arm vs the reference-proven dense sweep, same comparator as
    tests/test_cull.py (hit mask equal; distances allclose; winner prim
    equal up to the packed-key tie class; ST/normal equal on same-winner
    lanes).  Raises on divergence -- the bench must not publish numbers for
    a kernel that is wrong on hardware."""
    from simple_spectral_tpu.render.cull import intersect_rays_cull
    from simple_spectral_tpu.render.intersect import intersect_rays_soa
    from simple_spectral_tpu.render.vec import V3

    rng = np.random.default_rng(seed)
    sl = slice(0, n_check)
    o_s = V3(o.x[sl], o.y[sl], o.z[sl])
    d_s = V3(d.x[sl], d.y[sl], d.z[sl])
    ignore = jnp.asarray(
        rng.integers(-1, scene.n_prims, size=n_check), jnp.int32)
    r_cull = jax.jit(
        lambda: intersect_rays_cull(scene, o_s, d_s, ignore, eps))()
    r_soa = jax.jit(
        lambda: intersect_rays_soa(scene, o_s, d_s, ignore, eps))()
    hit_c = np.asarray(r_cull.hit)
    hit_s = np.asarray(r_soa.hit)
    np.testing.assert_array_equal(hit_c, hit_s)
    m = hit_c
    np.testing.assert_allclose(
        np.asarray(r_cull.dist)[m], np.asarray(r_soa.dist)[m],
        rtol=1e-5, atol=1e-3)
    same = np.asarray(r_cull.prim)[m] == np.asarray(r_soa.prim)[m]
    assert same.mean() > 0.995, f"prim mismatch {(~same).sum()}/{m.sum()}"
    np.testing.assert_array_equal(
        np.asarray(r_cull.mat)[m][same], np.asarray(r_soa.mat)[m][same])
    for a, b in ((r_cull.normal.x, r_soa.normal.x),
                 (r_cull.st_s, r_soa.st_s), (r_cull.st_t, r_soa.st_t)):
        np.testing.assert_allclose(
            np.asarray(a)[m][same], np.asarray(b)[m][same],
            rtol=1e-4, atol=1e-4)
    assert not np.any(np.asarray(r_cull.prim)[m] == np.asarray(ignore)[m])
    return {"rays": n_check, "hits": int(m.sum()),
            "prim_tie_diffs": int((~same).sum()), "parity": "ok"}


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
            par = parity_check(scene, cfg.eps, o, d)
            row[f"parity_{tag}"] = par
            print(f"  parity[{tag}]: {par}", flush=True)
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
