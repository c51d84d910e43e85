"""Ablation timings: isolate intersect / shading / NEE / texture costs and
the forward/backward split, and RECORD them as a committed JSON artifact
(tools/ablation_rNN.json) so perf work is regression-checkable.

Uses tools.tpu_bench (chained calls + RTT-subtracted readback) -- naive
block_until_ready timing is meaningless through the axon tunnel.

Usage:  python tools/perf_ablate.py [out.json] [group ...]
groups: fwd, split, chunk, remat (default: all)
"""
import json
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
RESULTS = []


OUT_PATH = None


def record(label, dt, rays):
    RESULTS.append({
        "label": label, "ms_per_call": round(dt * 1e3, 3),
        "mrays_per_s": round(rays / dt / 1e6, 2) if rays else None,
    })
    _flush()


def _flush():
    if OUT_PATH:
        with open(OUT_PATH, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "rtt_s": RTT,
                       "lanes": N, "results": RESULTS}, f, indent=1)


def guarded(fn, *args, **kw):
    """Run one bench row; record failures (e.g. OOM) as data, keep going."""
    label = args[0]
    try:
        fn(*args, **kw)
    except Exception as e:  # noqa: BLE001
        RESULTS.append({"label": label, "error": repr(e)[:300]})
        print(f"{label}: FAILED {repr(e)[:200]}", flush=True)
        _flush()


def bench(label, cfg, strip_texture=False):
    import dataclasses

    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    if strip_texture:
        scene = dataclasses.replace(scene, texture=None)
    px = jnp.arange(N, dtype=jnp.int32)

    def step(state, i):
        key, tok = state
        key = jax.random.fold_in(key, tok + i)
        out = _render_chunk(scene, tables, cfg, key, px, 1)
        return (key, chain_token(out))

    rays = N * (2 * cfg.max_depth - 1 if cfg.els else cfg.max_depth)
    dt = timeit_chained(label, step, (jax.random.PRNGKey(0), jnp.int32(0)),
                        K=12, rtt=RTT, rays=rays)
    record(label, dt, rays)


def bench_step(label, cfg, spp_chunk=4, fwd_only=False, remat="none",
               strip_texture=False):
    """forward(+backward) ablation (the bench.py unit), rays = forward rays."""
    import dataclasses

    from simple_spectral_tpu.render.trainstep import (
        forward_backward_step,
        forward_only_step,
    )

    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    if strip_texture:
        scene = dataclasses.replace(scene, texture=None)
    n_px = cfg.width * cfg.height
    lanes = min(n_px, cfg.max_lanes // max(spp_chunk, 1), N)
    pxl = jnp.arange(lanes, dtype=jnp.int32)
    target = jnp.zeros((lanes, 3), jnp.float32)
    key = jax.random.PRNGKey(0)
    fn = forward_only_step if fwd_only else forward_backward_step

    def step(state, i):
        loss_prev = state[0] if isinstance(state, tuple) else state
        tok = (loss_prev * 1e-30).astype(jnp.int32)
        k = jax.random.fold_in(jax.random.fold_in(key, i), tok)
        return fn(scene, tables, cfg, k, pxl, target, spp_chunk, remat)

    rays = float(lanes) * spp_chunk * (2 * cfg.max_depth - 1 if cfg.els else cfg.max_depth)
    dt = timeit_chained(label, step, step((jnp.float32(0.0),), 0), K=10,
                        rtt=RTT, rays=rays)
    record(label, dt, rays)


def main():
    global OUT_PATH
    args = sys.argv[1:]
    OUT_PATH = args.pop(0) if args and args[0].endswith(".json") else None
    groups = set(args) or {"fwd", "split", "chunk", "remat", "bwd"}
    base = dict(width=512, height=512, spp=64)
    canon = RenderConfig(scene="cornell-srgb", mode="mallett", **base)

    if "fwd" in groups:
        guarded(bench, "fwd cornell-srgb mallett ELS (canonical)", canon)
        guarded(bench, "fwd cornell-srgb mallett TEXTURE STRIPPED", canon, strip_texture=True)
        guarded(bench, "fwd cornell      mallett ELS (no texture)", RenderConfig(scene="cornell", mode="mallett", **base))
        guarded(bench, "fwd cornell-srgb mallett noELS (no NEE)", RenderConfig(scene="cornell-srgb", mode="mallett", els=False, **base))
        guarded(bench, "fwd cornell-srgb rgb     ELS (no spectra)", RenderConfig(scene="cornell-srgb", mode="rgb", **base))
        guarded(bench, "fwd cornell      rgb     noELS (minimal)", RenderConfig(scene="cornell", mode="rgb", els=False, **base))
        guarded(bench, "fwd cornell-srgb mallett ELS depth=2", RenderConfig(scene="cornell-srgb", mode="mallett", max_depth=2, **base))
        guarded(bench, "fwd cornell-srgb meng    ELS", RenderConfig(scene="cornell-srgb", mode="meng", **base))
        guarded(bench, "fwd cornell-srgb jakob   ELS", RenderConfig(scene="cornell-srgb", mode="jakob", **base))

    if "split" in groups:
        guarded(bench_step, "FWD-only loss canonical", canon, fwd_only=True)
        guarded(bench_step, "FWD+BWD canonical", canon)
        guarded(bench_step, "FWD-only loss TEXTURE STRIPPED", canon, fwd_only=True, strip_texture=True)
        guarded(bench_step, "FWD+BWD TEXTURE STRIPPED", canon, strip_texture=True)
        guarded(bench_step, "FWD+BWD cornell mallett (no texture)", RenderConfig(scene="cornell", mode="mallett", **base))
        guarded(bench_step, "FWD+BWD cornell-srgb rgb", RenderConfig(scene="cornell-srgb", mode="rgb", **base))
        guarded(bench_step, "FWD+BWD canonical no remat_cache", canon.replace(remat_cache=False))
        guarded(bench_step, "FWD-only canonical intersect=xla2",
                canon.replace(intersect_impl="xla2"), fwd_only=True)
        guarded(bench_step, "FWD+BWD canonical intersect=xla2",
                canon.replace(intersect_impl="xla2"))

    if "bwd" in groups:
        # isolate WHERE the ~105 ms backward (stripped) goes: spectra
        # precompute remat, per-bounce shading VJP, or fixed scan overhead
        guarded(bench_step, "BWD-iso rgb stripped FWD-only",
                RenderConfig(scene="cornell", mode="rgb", **base), fwd_only=True)
        guarded(bench_step, "BWD-iso rgb stripped FWD+BWD",
                RenderConfig(scene="cornell", mode="rgb", **base))
        guarded(bench_step, "BWD-iso mallett S=1 stripped FWD-only",
                RenderConfig(scene="cornell", mode="mallett", n_wavelengths=1, **base),
                fwd_only=True)
        guarded(bench_step, "BWD-iso mallett S=1 stripped FWD+BWD",
                RenderConfig(scene="cornell", mode="mallett", n_wavelengths=1, **base))
        guarded(bench_step, "BWD-iso mallett depth=2 stripped FWD-only",
                RenderConfig(scene="cornell", mode="mallett", max_depth=2, **base),
                fwd_only=True)
        guarded(bench_step, "BWD-iso mallett depth=2 stripped FWD+BWD",
                RenderConfig(scene="cornell", mode="mallett", max_depth=2, **base))
        guarded(bench_step, "BWD-iso canonical spp_chunk=1 FWD-only", canon,
                spp_chunk=1, fwd_only=True)
        guarded(bench_step, "BWD-iso canonical spp_chunk=1 FWD+BWD", canon,
                spp_chunk=1)

    if "chunk" in groups:
        for c in (2, 8, 16):
            guarded(bench_step, f"FWD+BWD canonical spp_chunk={c}", canon, spp_chunk=c)

    if "remat" in groups:
        guarded(bench_step, "FWD+BWD canonical remat=trace", canon, remat="trace")
        guarded(bench_step, "FWD+BWD remat=trace spp_chunk=16", canon, spp_chunk=16, remat="trace")

    _flush()
    if OUT_PATH:
        print(f"wrote {OUT_PATH}", flush=True)


RTT = measure_rtt()
print(f"tunnel RTT: {RTT*1e3:.1f} ms", flush=True)

if __name__ == "__main__":
    main()
