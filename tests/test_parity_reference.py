"""Whole-pipeline image parity against the *built* C++ reference renderer.

SURVEY.md section 4 oracle (b): the strongest end-to-end check is a converged
render compared against the reference itself.  tools/build_reference.py
compiles per-mode binaries from a patched copy of /root/reference (modes are
compile-time there, reference src/stdafx.hpp:63-93) using the GLM shim, runs
them with cwd-relative data, and parses the exact-float .csv framebuffer dump
(reference src/framebuffer.cpp:40-63).

RNG streams cannot match (PCG vs threefry, SURVEY section 7 "hard parts"), so
parity is statistical on converged images: both sides render the same config
at high spp with independent noise.  Comparison happens in sRGB (the space
the reference's framebuffer actually stores): gamma compression tames
firefly variance near the light, which otherwise dominates linear-RGB error
in 8x8 blocks even at 2048 spp (measured: single blocks swing 13-23% in
linear by seed alone, <4% in sRGB).  Metrics: per-channel image means (global
scale/tint bugs), 8x8-block-downsampled mean/p95 error (local systematic
bugs: flips, emission gating, shadowing), and a per-pixel p99 sanity bound.
Tolerances sit ~3x above the measured noise floor at these sample counts
(probe: rgb block8 mean 0.004 / mallett 0.006 at 2048-vs-1024 spp).

All tests are `slow` (minutes each: the reference renders on 2 CPU cores and
ours runs on the forced-CPU test backend).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.renderer import render_accumulate
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import (
    build_color_tables,
    ciexyz_to_srgb,
    lrgb_to_srgb,
    lrgb_to_srgb_np,
)
from tools.build_reference import load_reference_csv, run_reference

pytestmark = pytest.mark.slow


def _render_ours_srgb(cfg: RenderConfig, seed: int = 7) -> np.ndarray:
    """Converged mean -> sRGB f64[H, W, 3], bottom-to-top rows (the reference
    framebuffer's scanline order, so directly comparable to the CSV)."""
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    value, _alpha = render_accumulate(cfg, scene, tables, seed=seed)
    value = jnp.asarray(value, jnp.float32)
    if cfg.spectral:
        srgb = np.asarray(ciexyz_to_srgb(tables, value, cfg.mode))
    else:
        srgb = np.asarray(lrgb_to_srgb(value))
    return srgb.astype(np.float64)


def _compare(ref_srgb, ours_srgb, ch_tol, blk_mean_tol, blk_p95_tol, px_p99_tol):
    """Error metrics in sRGB, relative to overall image brightness."""
    scale = max(float(np.abs(ref_srgb).mean()), 1e-6)
    ch_rel = np.abs(
        ours_srgb.mean(axis=(0, 1)) - ref_srgb.mean(axis=(0, 1))
    ) / scale
    h, w, _ = ref_srgb.shape

    def blocks(im):
        return im.reshape(h // 8, 8, w // 8, 8, 3).mean(axis=(1, 3))

    berr = np.abs(blocks(ours_srgb) - blocks(ref_srgb)) / scale
    perr = np.abs(ours_srgb - ref_srgb) / scale
    stats = {
        "ch_rel_max": float(ch_rel.max()),
        "blk_mean": float(berr.mean()),
        "blk_p95": float(np.quantile(berr, 0.95)),
        "px_p99": float(np.quantile(perr, 0.99)),
    }
    assert stats["ch_rel_max"] < ch_tol, stats
    assert stats["blk_mean"] < blk_mean_tol, stats
    assert stats["blk_p95"] < blk_p95_tol, stats
    assert stats["px_p99"] < px_p99_tol, stats
    return stats


# (mode, scene, observer, spp_ref, spp_ours); all at 64x64 -- smaller +
# deeper spp converges per-pixel faster than wider frames at the same cost.
CONFIGS = [
    # BASELINE config 1 (cornell, classic RGB) at converged spp
    ("rgb", "cornell", 1931, 2048, 1024),
    # BASELINE config 2 (cornell-srgb, Mallett-Yuksel hero-wavelength)
    ("mallett", "cornell-srgb", 1931, 2048, 768),
    # CIE 2006 observer: mallett is the one mode the reference can compile
    # with CIE_OBSERVER 2006 (reference src/stdafx.hpp:82-86,107-109)
    ("mallett", "cornell-srgb", 2006, 2048, 768),
    # BASELINE config 4 scene (plane-srgb) with Jakob-Hanika: the reference
    # binary loads OUR re-fitted .coeff cube (the upstream blob is missing),
    # so this checks the renderer around the (shared) coefficient table.
    ("jakob", "plane-srgb", 1931, 2048, 768),
    # Meng et al. 2015 upsampling, cornell-srgb (observer 1931; the reference
    # cannot compile meng+2006, src/stdafx.hpp:107-109)
    ("meng", "cornell-srgb", 1931, 2048, 768),
]

# Two independent RNG streams per config: a marginal systematic error can
# hide under a single seed's noise margin; it cannot hide under two.
SEEDS = (7, 1234)

_STATS_PATH = os.path.join(os.path.dirname(__file__), "artifacts",
                           "parity_stats.json")


def _record_stats(key: str, stats: dict) -> None:
    """Persist measured parity error metrics as a committed artifact so the
    tolerances can be tightened from recorded data (idempotent per key)."""
    os.makedirs(os.path.dirname(_STATS_PATH), exist_ok=True)
    data = {}
    if os.path.exists(_STATS_PATH):
        with open(_STATS_PATH) as f:
            data = json.load(f)
    data[key] = stats
    with open(_STATS_PATH, "w") as f:
        json.dump(dict(sorted(data.items())), f, indent=1)
        f.write("\n")


@pytest.mark.parametrize("mode,scene,observer,spp_ref,spp_ours", CONFIGS)
def test_image_parity_vs_reference(tmp_path, mode, scene, observer, spp_ref,
                                   spp_ours):
    w = h = 64
    ref_csv = run_reference(mode, scene, w, h, spp_ref, tmp_path / "ref.csv",
                            observer=observer)
    ref_lrgb = load_reference_csv(ref_csv, w, h)[::-1]  # bottom-to-top
    ref_srgb = lrgb_to_srgb_np(ref_lrgb)

    cfg = RenderConfig(scene=scene, mode=mode, width=w, height=h,
                       spp=spp_ours, observer=observer)
    for seed in SEEDS:
        ours_srgb = _render_ours_srgb(cfg, seed=seed)
        stats = _compare(
            ref_srgb, ours_srgb,
            ch_tol=0.015, blk_mean_tol=0.02, blk_p95_tol=0.06, px_p99_tol=0.20,
        )
        _record_stats(f"{mode}-{scene}-{observer}-seed{seed}", stats)
        print(f"{mode}/{scene}/{observer} seed={seed} {w}x{h}: {stats}")
