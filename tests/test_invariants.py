"""Analytic invariants of the whole spectral transport chain.

SURVEY.md section 4 oracles (c)+(a): checks that need no reference build.

* Furnace test: with every albedo == 1 exactly (constant spectrum, no
  upsampling involved) and a D65 light, every rendered pixel's chromaticity
  must equal D65's -- throughput-1 paths leave the emission spectrum intact,
  so any tint exposes a transport / hero-estimator / colorimetry bug
  (reference notes the property at src/scene.cpp:346-355).
* Cross-mode consistency: mallett / meng / jakob are different reflectance
  models for the SAME scene; converged renders must agree to within the
  models' documented error (the paper's core comparison, Fig. 5).
* Exhaustive 2^24 sRGB round trip at the reference's recorded f32 bound
  1.851469e-5 (reference src/main.cpp:242-265).
* plane-srgb ELS(lambertian box) vs no-ELS(mirror box) convergence
  equivalence (reference src/scene.cpp:346-362).
* ELS vs brute-force agreement at tight tolerance (high-spp variant of the
  15%-tolerance smoke test in test_render.py).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.renderer import render_accumulate
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra import colorimetry as cm
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


def _furnace_scene(cfg, tables):
    """cornell-srgb with every material's albedo forced to the constant
    spectrum 1 (grid low=0, step=1e4: any lambda interpolates between two
    ones) and textures disabled -- reflectance is exactly 1 at every
    wavelength, in every mode."""
    scene = build_scene(cfg, tables)
    m = scene.materials
    ka = m.albedo_values.shape
    mats = dataclasses.replace(
        m,
        albedo_kind=jnp.zeros_like(m.albedo_kind),  # ALBEDO_CONSTANT == 0
        albedo_values=jnp.ones(ka, jnp.float32),
        albedo_low=jnp.zeros_like(m.albedo_low),
        albedo_inv_step=jnp.full_like(m.albedo_inv_step, 1e-4),
        albedo_rgb=jnp.ones_like(m.albedo_rgb),
    )
    return dataclasses.replace(scene, materials=mats)


@pytest.mark.parametrize("mode", ["mallett", "meng", "jakob"])
def test_furnace_d65_chromaticity(mode):
    cfg = RenderConfig(scene="cornell-srgb", mode=mode, width=8, height=8,
                       spp=512, max_depth=10)
    tables = build_color_tables(cfg)
    scene = _furnace_scene(cfg, tables)
    value, alpha = render_accumulate(cfg, scene, tables, seed=5)
    xyz = np.asarray(value, np.float64)  # [H, W, 3]
    assert np.isfinite(xyz).all()
    # the cornell front face is open (the camera looks in), so edge pixels
    # miss on a fraction of subpixel jitters; misses contribute exact zeros
    # to XYZ and cancel out of the chromaticity ratio
    assert np.asarray(alpha).mean() > 0.75

    s = xyz.sum(axis=-1)
    assert s.min() > 0.0
    xy = xyz[..., :2] / s[..., None]
    d65 = np.asarray(tables.host["d65_rad_xyz"], np.float64)
    d65_xy = d65[:2] / d65.sum()
    mean_dev = np.abs(xy.mean(axis=(0, 1)) - d65_xy).max()
    px_dev = np.abs(xy - d65_xy).max()
    assert mean_dev < 5e-3, (xy.mean(axis=(0, 1)), d65_xy)
    assert px_dev < 2.5e-2, (px_dev, d65_xy)


def test_furnace_rgb_mode():
    """RGB-mode analog: albedo (1,1,1) everywhere -> every pixel's lRGB is a
    positive multiple of the light's emission_rgb."""
    cfg = RenderConfig(scene="cornell-srgb", mode="rgb", width=8, height=8,
                       spp=512, max_depth=10)
    tables = build_color_tables(cfg)
    scene = _furnace_scene(cfg, tables)
    value, _ = render_accumulate(cfg, scene, tables, seed=5)
    rgb = np.asarray(value, np.float64)
    emi = np.asarray(scene.materials.emission_rgb, np.float64)
    light = emi[np.abs(emi).sum(axis=1).argmax()]
    ours = rgb / rgb.sum(axis=-1, keepdims=True)
    want = light / light.sum()
    assert np.abs(ours.mean(axis=(0, 1)) - want).max() < 5e-3
    assert np.abs(ours - want).max() < 2.5e-2


@pytest.mark.slow
def test_cross_mode_consistency_cornell_srgb():
    """Converged cornell-srgb sRGB means must agree across the three
    spectral upsampling models to within their documented model error."""
    means = {}
    for mode in ("mallett", "meng", "jakob"):
        cfg = RenderConfig(scene="cornell-srgb", mode=mode, width=16,
                           height=16, spp=512)
        tables = build_color_tables(cfg)
        scene = build_scene(cfg, tables)
        value, _ = render_accumulate(cfg, scene, tables, seed=9)
        srgb = np.asarray(
            cm.ciexyz_to_srgb(tables, jnp.asarray(value, jnp.float32), mode)
        ).astype(np.float64)
        means[mode] = srgb.mean(axis=(0, 1))
    ref = means["mallett"]
    scale = np.abs(ref).mean()
    for mode in ("meng", "jakob"):
        rel = np.abs(means[mode] - ref) / scale
        assert rel.max() < 0.06, (mode, means)


@pytest.mark.slow
def test_round_trip_exhaustive_2e24():
    """ALL 24-bit sRGB colors through basis->spectrum->XYZ->lRGB, max error
    at the reference's recorded f32 bound (src/main.cpp:242-265)."""
    cfg = RenderConfig(scene="cornell", mode="mallett", observer=1931)
    tables = build_color_tables(cfg)
    worst = 0.0
    chunk = 1 << 18
    for base in range(0, 1 << 24, chunk):
        idx = np.arange(base, base + chunk, dtype=np.uint32)
        srgb8 = np.stack(
            [(idx >> 16) & 0xFF, (idx >> 8) & 0xFF, idx & 0xFF], axis=-1
        ).astype(np.float32) / 255.0
        lrgb = cm.srgb_to_lrgb_np(srgb8).astype(np.float32)
        out = np.asarray(cm.round_trip_lrgb(tables, jnp.asarray(lrgb)))
        worst = max(worst, float(np.abs(out - lrgb).max()))
        assert worst < 1.9e-5, (hex(base), worst)
    # the reference records 1.851469e-5 as its own max over the same sweep
    assert worst < 1.9e-5, worst


@pytest.mark.slow
def test_plane_srgb_els_vs_mirror_equivalence():
    """plane-srgb's two variants -- ELS with a lambertian white box vs
    brute-force with a mirror box -- converge to the same image (the
    reference builds the scene this way for exactly this check,
    src/scene.cpp:346-362)."""
    imgs = {}
    for els in (True, False):
        cfg = RenderConfig(scene="plane-srgb", mode="mallett", width=24,
                           height=24, spp=1536 if not els else 512, els=els)
        tables = build_color_tables(cfg)
        scene = build_scene(cfg, tables)
        value, _ = render_accumulate(cfg, scene, tables, seed=3 if els else 4)
        imgs[els] = np.asarray(value, np.float64)
    scale = np.abs(imgs[True]).mean()
    ch = np.abs(imgs[True].mean(axis=(0, 1)) - imgs[False].mean(axis=(0, 1)))
    assert ch.max() / scale < 0.05, (imgs[True].mean(axis=(0, 1)),
                                     imgs[False].mean(axis=(0, 1)))

    def blocks(im):
        return im.reshape(3, 8, 3, 8, 3).mean(axis=(1, 3))

    berr = np.abs(blocks(imgs[True]) - blocks(imgs[False])) / scale
    assert berr.mean() < 0.06, berr.mean()


@pytest.mark.slow
def test_els_vs_brute_force_tight():
    """High-spp variant of the ELS agreement test: image means within 3%
    (the 15% smoke tolerance in test_render.py could hide a systematic
    few-percent energy error; this one cannot)."""
    cfg_els = RenderConfig(scene="cornell", mode="rgb", width=8, height=8,
                           spp=2048, els=True, max_depth=6)
    cfg_bf = dataclasses.replace(cfg_els, els=False, spp=16384)
    tables = build_color_tables(cfg_els)
    scene = build_scene(cfg_els, tables)
    v_els, _ = render_accumulate(cfg_els, scene, tables, seed=1)
    scene_bf = build_scene(cfg_bf, tables)
    v_bf, _ = render_accumulate(cfg_bf, scene_bf, tables, seed=2)
    m_els = np.asarray(v_els).mean(axis=(0, 1))
    m_bf = np.asarray(v_bf).mean(axis=(0, 1))
    rel = np.abs(m_els - m_bf) / max(np.abs(m_els).max(), 1e-9)
    assert rel.max() < 0.03, (m_els, m_bf)
