"""Cull cluster-size ablation at 50k tris (round 5): is L=63 the right
cluster capacity?  Measured: 63 beats 31 and 15 end-to-end
(tools/cull_cluster_exp_r05.json) -- the kernel is DMA-iteration/list-
length bound, not test-granularity bound.

Usage: python tools/bench_cull_cluster.py [out.json]
"""
import json
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from tools.tpu_bench import measure_rtt, timeit_chained
from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.renderer import _render_chunk
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables

rtt = measure_rtt(); print(f"RTT {rtt*1e3:.1f} ms", flush=True)
key = jax.random.PRNGKey(0)
out = []
for csize in (63, 31, 15):
    cfg = RenderConfig(scene="cornell-stress", mode="rgb", width=512, height=512,
                       stress_boxes=5000, stress_spheres=250,
                       intersect_impl="cull", cull_cluster_size=csize)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    lanes = 262144
    px = jnp.arange(lanes, dtype=jnp.int32)
    def step(state, i, cfg=cfg, scene=scene, tables=tables):
        tok = (jnp.ravel(state[0])[0] * 1e-30).astype(jnp.int32)
        k = jax.random.fold_in(jax.random.fold_in(key, i), tok)
        return _render_chunk(scene, tables, cfg, k, px, 1)
    s0 = step((jnp.zeros((lanes, 3)),), 0)
    dt = timeit_chained("", step, s0, K=5, rtt=rtt, quiet=True)
    row = {"cluster_size": csize, "clusters": int(scene.cull_tiles.shape[0]),
           "ms": round(dt*1e3, 1)}
    out.append(row); print(row, flush=True)
json.dump(out, open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/cull_cluster_exp.json", "w"), indent=1)
