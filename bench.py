"""Benchmark: forward+backward Mrays/s/chip on the canonical config.

Canonical config (BASELINE.md): cornell-srgb 512x512 @ 64 spp, spectral
Mallett-Yuksel pipeline, CIE 1931, 4 hero wavelengths, MAX_DEPTH 10, ELS on.

Ray accounting matches the reference upper bound (BASELINE.md): each sample
traces 1 camera ray + (MAX_DEPTH-1) x (1 shadow + 1 BSDF) = 2*MAX_DEPTH - 1
scene intersections; fwd+bwd counts the forward rays once (the backward sweep
re-traverses the same paths' AD graph, it does not trace new rays).

Prints ONE JSON line:
  {"metric": "Mrays/s/chip fwd+bwd cornell-srgb 512^2@64spp mallett",
   "value": ..., "unit": "Mrays/s", "vs_baseline": value / 100.0}
(vs_baseline is relative to the BASELINE.json north-star target of
100 Mrays/s/chip; the reference publishes no numbers of its own.)
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.render.trainstep import forward_backward_step
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    size = int(os.environ.get("BENCH_SIZE", "512"))
    spp = int(os.environ.get("BENCH_SPP", "64"))
    cfg = RenderConfig(scene="cornell-srgb", mode="mallett", width=size, height=size, spp=spp)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)

    n_px = cfg.width * cfg.height
    # Lanes per device call: bounded so HBM holds the wavefront state.
    lanes = min(n_px, cfg.max_lanes)
    px = jnp.arange(lanes, dtype=jnp.int32)
    target = jnp.zeros((lanes, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    # warmup / compile
    spp_chunk = int(os.environ.get("BENCH_SPP_CHUNK", "1"))
    loss, grads = forward_backward_step(scene, tables, cfg, key, px, target, spp_chunk)
    jax.block_until_ready((loss, grads))

    n_chunks_px = (n_px + lanes - 1) // lanes
    n_chunks_spp = (spp + spp_chunk - 1) // spp_chunk
    t0 = time.time()
    for cp in range(n_chunks_px):
        for cs in range(n_chunks_spp):
            k = jax.random.fold_in(key, cp * n_chunks_spp + cs)
            loss, grads = forward_backward_step(scene, tables, cfg, k, px, target, spp_chunk)
    jax.block_until_ready((loss, grads))
    dt = time.time() - t0

    rays = float(n_px) * spp * (2 * cfg.max_depth - 1)
    mrays = rays / dt / 1e6
    print(json.dumps({
        "metric": "Mrays/s/chip fwd+bwd cornell-srgb 512^2@64spp mallett",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
    }))


if __name__ == "__main__":
    main()
