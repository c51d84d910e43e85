"""Ablation timings: isolate intersect / shading / NEE / texture costs.

Uses tools.tpu_bench (chained calls + RTT-subtracted readback) -- naive
block_until_ready timing is meaningless through the axon tunnel.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.renderer import _render_chunk
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables
from tools.tpu_bench import chain_token, measure_rtt, timeit_chained

N = 262144
px = jnp.arange(N, dtype=jnp.int32)
RTT = measure_rtt()
print(f"tunnel RTT: {RTT*1e3:.1f} ms", flush=True)


def bench(label, cfg, strip_texture=False):
    import dataclasses

    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    if strip_texture:
        scene = dataclasses.replace(scene, texture=None)

    def step(state, i):
        key, tok = state
        key = jax.random.fold_in(key, tok + i)
        out = _render_chunk(scene, tables, cfg, key, px, 1)
        return (key, chain_token(out))

    rays = N * (2 * cfg.max_depth - 1 if cfg.els else cfg.max_depth)
    timeit_chained(label, step, (jax.random.PRNGKey(0), jnp.int32(0)),
                   K=12, rtt=RTT, rays=rays)


def bench_fwd_bwd(label, cfg, spp_chunk=4):
    """forward+backward ablation (the bench.py unit), rays = forward rays."""
    from simple_spectral_tpu.render.trainstep import forward_backward_step

    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    n_px = cfg.width * cfg.height
    lanes = min(n_px, cfg.max_lanes // max(spp_chunk, 1), N)
    pxl = jnp.arange(lanes, dtype=jnp.int32)
    target = jnp.zeros((lanes, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    def step(state, i):
        tok = (state[0] * 1e-30).astype(jnp.int32)
        k = jax.random.fold_in(jax.random.fold_in(key, i), tok)
        return forward_backward_step(scene, tables, cfg, k, pxl, target, spp_chunk)

    rays = float(lanes) * spp_chunk * (2 * cfg.max_depth - 1 if cfg.els else cfg.max_depth)
    timeit_chained(label, step, step((jnp.float32(0.0),), 0), K=10, rtt=RTT, rays=rays)


base = dict(width=512, height=512, spp=64)
bench("cornell-srgb mallett ELS  (canonical)", RenderConfig(scene="cornell-srgb", mode="mallett", **base))
bench("cornell-srgb mallett TEXTURE STRIPPED", RenderConfig(scene="cornell-srgb", mode="mallett", **base), strip_texture=True)
bench("cornell      mallett ELS  (no texture)", RenderConfig(scene="cornell", mode="mallett", **base))
bench("cornell-srgb mallett noELS (no NEE)", RenderConfig(scene="cornell-srgb", mode="mallett", els=False, **base))
bench("cornell-srgb rgb     ELS  (no spectra)", RenderConfig(scene="cornell-srgb", mode="rgb", **base))
bench("cornell      rgb     noELS (minimal)", RenderConfig(scene="cornell", mode="rgb", els=False, **base))
bench("cornell-srgb mallett ELS depth=2", RenderConfig(scene="cornell-srgb", mode="mallett", max_depth=2, **base))
bench("cornell-srgb meng    ELS", RenderConfig(scene="cornell-srgb", mode="meng", **base))
bench("cornell-srgb jakob   ELS", RenderConfig(scene="cornell-srgb", mode="jakob", **base))
bench_fwd_bwd("FWD+BWD cornell-srgb mallett (canonical)", RenderConfig(scene="cornell-srgb", mode="mallett", **base))
bench_fwd_bwd("FWD+BWD cornell      mallett (no texture)", RenderConfig(scene="cornell", mode="mallett", **base))
bench_fwd_bwd("FWD+BWD cornell-srgb rgb", RenderConfig(scene="cornell-srgb", mode="rgb", **base))
bench_fwd_bwd("FWD+BWD canonical spp_chunk=8", RenderConfig(scene="cornell-srgb", mode="mallett", **base), spp_chunk=8)
bench_fwd_bwd("FWD+BWD canonical spp_chunk=2", RenderConfig(scene="cornell-srgb", mode="mallett", **base), spp_chunk=2)
