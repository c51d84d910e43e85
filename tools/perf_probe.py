"""Probe: where does the time go on the real TPU?"""
import sys
import time

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.renderer import _render_chunk
from simple_spectral_tpu.render.trainstep import forward_backward_step
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables

print("backend:", jax.default_backend(), flush=True)
cfg = RenderConfig(scene="cornell-srgb", mode="mallett", width=512, height=512, spp=64)
tables = build_color_tables(cfg)
scene = build_scene(cfg, tables)
key = jax.random.PRNGKey(0)


def timeit(label, fn, *args, reps=3, rays_per_call=0):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label:40s} compile+1st {time.time()-t0:6.1f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    extra = f"  {rays_per_call/dt/1e6:8.2f} Mrays/s" if rays_per_call else ""
    print(f"{label:40s} {dt*1e3:9.1f} ms{extra}", flush=True)
    return dt


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("fwd", "all"):
    for n_lanes in (65536, 262144):
        px = jnp.arange(n_lanes, dtype=jnp.int32)
        rays = n_lanes * (2 * cfg.max_depth - 1)
        timeit(f"forward lanes={n_lanes}",
               lambda px=px: _render_chunk(scene, tables, cfg, key, px, 1),
               rays_per_call=rays)
if which in ("bwd", "all"):
    n_lanes = 262144
    px = jnp.arange(n_lanes, dtype=jnp.int32)
    tgt = jnp.zeros((n_lanes, 3), jnp.float32)
    rays = n_lanes * (2 * cfg.max_depth - 1)
    timeit(f"fwd+bwd lanes={n_lanes}",
           lambda: forward_backward_step(scene, tables, cfg, key, px, tgt, 1),
           rays_per_call=rays)
