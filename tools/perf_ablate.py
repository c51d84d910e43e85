"""Ablation timings: isolate intersect / shading / NEE / texture costs."""
import time

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.renderer import _render_chunk
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables

N = 262144
px = jnp.arange(N, dtype=jnp.int32)
key = jax.random.PRNGKey(0)


def bench(label, cfg):
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    out = _render_chunk(scene, tables, cfg, key, px, 1)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(3):
        out = _render_chunk(scene, tables, cfg, key, px, 1)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 3
    rays = N * (2 * cfg.max_depth - 1 if cfg.els else cfg.max_depth)
    print(f"{label:42s} {dt*1e3:8.1f} ms  {rays/dt/1e6:8.1f} Mrays/s", flush=True)
    return dt


base = dict(width=512, height=512, spp=64)
bench("cornell-srgb mallett ELS  (canonical)", RenderConfig(scene="cornell-srgb", mode="mallett", **base))
bench("cornell      mallett ELS  (no texture)", RenderConfig(scene="cornell", mode="mallett", **base))
bench("cornell-srgb mallett noELS (no NEE)", RenderConfig(scene="cornell-srgb", mode="mallett", els=False, **base))
bench("cornell-srgb rgb     ELS  (no spectra)", RenderConfig(scene="cornell-srgb", mode="rgb", **base))
bench("cornell      rgb     noELS (minimal)", RenderConfig(scene="cornell", mode="rgb", els=False, **base))
bench("cornell-srgb mallett ELS depth=2", RenderConfig(scene="cornell-srgb", mode="mallett", max_depth=2, **base))
