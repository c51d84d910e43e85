"""Render orchestration: lanes -> pixels -> image.

Replaces the reference's thread pool + mutex-guarded tile queue (reference
src/renderer.cpp:309-430) with static work partitioning: the (pixels x spp)
lane grid is chunked to bound device memory, each chunk is one jit call, and
per-pixel averages accumulate in float64 on the host exactly as the reference
accumulates per-pixel samples in f64 (reference src/renderer.cpp:287-296).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.integrator import trace_lanes
from simple_spectral_tpu.scene.types import SceneData
from simple_spectral_tpu.spectra.colorimetry import (
    ColorTables,
    ciexyz_to_srgb,
    lrgb_to_srgb,
)


def _render_chunk_impl(scene, tables, cfg: RenderConfig, key, px_flat, spp: int):
    p = px_flat.shape[0]
    px_i = px_flat % cfg.width
    px_j = px_flat // cfg.width
    keys = jax.random.split(key, spp)

    # One scan step per sample keeps peak memory at P lanes; accumulate sums.
    def body(carry, k):
        acc_v, acc_a = carry
        res = trace_lanes(scene, tables, cfg, k, px_i, px_j)
        return (acc_v + res.value, acc_a + res.alpha), None

    # value is XYZ in spectral modes, lRGB in rgb mode -- 3 channels either way
    init = (jnp.zeros((p, 3), jnp.float32), jnp.zeros((p,), jnp.float32))
    (sum_v, sum_a), _ = jax.lax.scan(body, init, keys)
    return sum_v, sum_a


_render_chunk_jit = partial(jax.jit, static_argnums=(2, 5))(_render_chunk_impl)


@partial(jax.jit, static_argnums=(2, 5))
def _render_chunk_checked(scene, tables, cfg: RenderConfig, key, px_flat, spp: int):
    """checkify-instrumented variant (cfg.debug_checks): every op is checked
    for NaN / inf / division-by-zero and the first failure is reported with
    its source location (SURVEY.md section 5, NaN-guard debug mode)."""
    from jax.experimental import checkify

    checked = checkify.checkify(
        lambda *a: _render_chunk_impl(*a, spp), errors=checkify.float_checks
    )
    return checked(scene, tables, cfg, key, px_flat)


def render_chunk_lanes(cfg: RenderConfig, scene) -> int:
    """Pixel-lane budget for one render chunk.  _render_chunk scans over
    spp, so peak memory is O(lanes) regardless of sample count -- the full
    cfg.max_lanes can ride in one call (round 5; the previous
    max_lanes // spp sizing cut BASELINE config 5's 256-spp chunks to 8192
    lanes, ~1/32 of the efficient call size).  BVH-scale scenes cap at 2^18
    lanes: the cull arm's dense [C, N] slab stage scales with cluster count
    and would OOM at the full budget."""
    lanes = cfg.max_lanes
    if getattr(scene, "cull_tiles", None) is not None:
        lanes = min(lanes, 1 << 18)
    if cfg.spectral and cfg.mode == "meng" and scene.texture is not None:
        # the on-device grid walk's per-bounce [P~186, N] omega / one-hot
        # tensors put meng HBM-bound past ~2^18 lanes (measured: 1024^2
        # single-chunk ran 4x slower than 2^18 chunks -- tools/cfg5_r05.json)
        lanes = min(lanes, 1 << 18)
    return max(1, lanes)


def _render_chunk(scene, tables, cfg: RenderConfig, key, px_flat, spp: int):
    """Trace ``spp`` samples for each pixel in ``px_flat`` (i32[P]) and
    return (sum f32[P,S], alpha_sum f32[P]) over samples."""
    if cfg.debug_checks:
        err, out = _render_chunk_checked(scene, tables, cfg, key, px_flat, spp)
        err.throw()  # no-op when clean; JaxRuntimeError with location else
        return out
    return _render_chunk_jit(scene, tables, cfg, key, px_flat, spp)


def render_accumulate(
    cfg: RenderConfig,
    scene: SceneData,
    tables: ColorTables,
    seed: int = 0,
    progress: bool = False,
):
    """Monte-Carlo estimate of the per-pixel mean value (XYZ in spectral
    modes, lRGB flux in rgb mode) and hit-mask alpha.

    Returns (value f64[H, W, S], alpha f64[H, W]) with row 0 at the *bottom*
    of the image (the reference framebuffer's scanline order, reference
    src/framebuffer.hpp:23-26).
    """
    w, h, spp = cfg.width, cfg.height, cfg.spp
    n_px = w * h
    px_per_chunk = max(1, min(n_px, render_chunk_lanes(cfg, scene)))
    key = jax.random.PRNGKey(seed)

    value = np.zeros((n_px, 3), np.float64)
    alpha = np.zeros((n_px,), np.float64)
    t0 = time.time()
    n_chunks = (n_px + px_per_chunk - 1) // px_per_chunk
    for c in range(n_chunks):
        lo = c * px_per_chunk
        hi = min(lo + px_per_chunk, n_px)
        px = jnp.arange(lo, hi, dtype=jnp.int32)
        ck = jax.random.fold_in(key, c)
        sum_v, sum_a = _render_chunk(scene, tables, cfg, ck, px, spp)
        value[lo:hi] = np.asarray(sum_v, np.float64) / spp
        alpha[lo:hi] = np.asarray(sum_a, np.float64) / spp
        if progress:
            done = hi / n_px
            dt = time.time() - t0
            eta = dt / max(done, 1e-9) * (1.0 - done)
            print(f"\r{done*100.0:6.2f}%  elapsed {dt:6.1f}s  ETA {eta:6.1f}s", end="", flush=True)
    if progress:
        print()
    return value.reshape(h, w, 3), alpha.reshape(h, w)


def finalize_srgb(cfg: RenderConfig, tables: ColorTables, value, alpha) -> np.ndarray:
    """Convert the accumulated mean to the sRGB+alpha framebuffer (reference
    src/renderer.cpp:292-298).  Returns f32[H, W, 4], row 0 at bottom."""
    v = jnp.asarray(value, jnp.float32)
    if cfg.spectral:
        srgb = ciexyz_to_srgb(tables, v, cfg.mode)
    else:
        srgb = lrgb_to_srgb(v)
    srgb = np.asarray(srgb, np.float32)
    return np.concatenate([srgb, np.asarray(alpha, np.float32)[..., None]], axis=-1)


def render_image(
    cfg: RenderConfig,
    scene: Optional[SceneData] = None,
    tables: Optional[ColorTables] = None,
    seed: int = 0,
    progress: bool = False,
) -> np.ndarray:
    """Full pipeline: build tables/scene if not given, trace, convert.

    Returns sRGB+A f32[H, W, 4], row 0 at the bottom (flip before viewing).
    """
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    if tables is None:
        tables = build_color_tables(cfg)
    if scene is None:
        scene = build_scene(cfg, tables)
    value, alpha = render_accumulate(cfg, scene, tables, seed=seed, progress=progress)
    return finalize_srgb(cfg, tables, value, alpha)
