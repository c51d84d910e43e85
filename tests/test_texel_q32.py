"""Tests for the u32 texel formats (config.texel_format, round 5).

jakob "u32" = q32: the three sigmoid-polynomial coefficients asinh-companded
into 10/11/11-bit fixed point in one word (spectra/upsample_jakob.py);
meng "u32" = raw sRGB texel + the on-device gather-free grid walk
(spectra/upsample_meng.py meng_cell_weights_soa_onehot).  Fidelity bounds
here mirror the full-texture measurement in tools/texel_q32_check.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.integrator import trace_lanes
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


def _render(cfg, n=2048, spp=4, seed=0):
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    px = jnp.arange(n, dtype=jnp.int32) % (cfg.width * cfg.height)
    f = jax.jit(
        lambda k: trace_lanes(
            scene, tables, cfg, k, px % cfg.width, px // cfg.width
        ).value
    )
    key = jax.random.PRNGKey(seed)
    out = jnp.zeros((n, 3))
    for s in range(spp):
        out = out + f(jax.random.fold_in(key, s))
    return np.asarray(out / spp)


def test_jakob_q32_pack_eval_roundtrip():
    """Pack -> device-decode error on real texture coefficients: bounded by
    the companding design (pointwise reflectance max ~4e-2 at sigmoid
    crossings, mean ~6e-4; full-texture numbers: tools/texel_q32_check.py)."""
    from PIL import Image

    from simple_spectral_tpu.spectra.colorimetry import srgb_to_lrgb_np
    from simple_spectral_tpu.spectra.spectrum import data_path
    from simple_spectral_tpu.spectra.upsample_jakob import (
        jakob_q32_eval_soa,
        jakob_q32_pack,
        rgb2spec_fetch_soa,
    )

    cfg = RenderConfig(scene="plane-srgb", mode="jakob")
    tables = build_color_tables(cfg)
    img = np.asarray(
        Image.open(data_path("scenes", cfg.texture)).convert("RGB"), np.uint8
    ).reshape(-1, 3)
    rng = np.random.default_rng(7)
    sub = rng.choice(len(img), 4096, replace=False)
    lrgb = srgb_to_lrgb_np(img[sub].astype(np.float32) / 255.0)
    c0, c1, c2 = (
        np.asarray(v, np.float64)
        for v in rgb2spec_fetch_soa(
            tables.jakob, lrgb[:, 0], lrgb[:, 1], lrgb[:, 2]
        )
    )
    words, meta = jakob_q32_pack(c0, c1, c2)
    lam = np.linspace(380.0, 830.0, 46)
    x = (c0[:, None] * lam + c1[:, None]) * lam + c2[:, None]
    r_ref = 0.5 * x / np.sqrt(x * x + 1.0) + 0.5
    errs = []
    for k in range(len(lam)):
        out = jakob_q32_eval_soa(
            jnp.asarray(words), jnp.asarray(meta),
            jnp.full((len(words),), np.float32(lam[k])), 1, 0.0,
        )
        errs.append(np.abs(np.asarray(out[0], np.float64) - r_ref[:, k]))
    e = np.stack(errs)
    assert e.mean() < 1.5e-3, e.mean()
    assert np.quantile(e, 0.999) < 0.03, np.quantile(e, 0.999)
    assert e.max() < 0.08, e.max()


def test_jakob_q32_black_texel():
    """The reserved a2 code decodes to exactly zero reflectance (the z=0
    division-by-zero case of reference rgb2spec.c:77-118)."""
    from simple_spectral_tpu.spectra.upsample_jakob import (
        jakob_q32_eval_soa,
        jakob_q32_pack,
    )

    c0 = np.array([0.0, 0.0])
    c1 = np.array([0.0, 0.0])
    c2 = np.array([-1e6, 5.0])  # black sentinel; constant bright (x = 5)
    words, meta = jakob_q32_pack(c0, c1, c2)
    out = jakob_q32_eval_soa(
        jnp.asarray(words), jnp.asarray(meta),
        jnp.asarray([500.0, 500.0], jnp.float32), 2, 100.0,
    )
    assert np.all(np.asarray(out[:, 0]) == 0.0)
    assert np.all(np.asarray(out[:, 1]) > 0.9)  # saturated bright texel


def test_meng_onehot_matches_gather_walk():
    """The device one-hot cell walk must reproduce the gather-based walk
    exactly (same arithmetic, only the table reads differ) -- including
    boundary fan cells and invalid chromaticities."""
    from simple_spectral_tpu.spectra.upsample_meng import (
        lrgb_to_xyz_meng,
        meng_cell_weights_soa,
        meng_cell_weights_soa_onehot,
    )

    cfg = RenderConfig(scene="cornell-srgb", mode="meng")
    tables = build_color_tables(cfg)
    rng = np.random.default_rng(3)
    # random colors incl. saturated primaries (boundary cells) and black
    lrgb = rng.uniform(0.0, 1.0, (2048, 3)).astype(np.float32)
    lrgb[:16] = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
    lrgb[16:20] = 0.0
    x, y, z = lrgb_to_xyz_meng(
        jnp.asarray(lrgb[:, 0]), jnp.asarray(lrgb[:, 1]), jnp.asarray(lrgb[:, 2])
    )
    p_a, w_a = jax.jit(meng_cell_weights_soa, static_argnums=())(
        tables.meng, x, y, z)
    p_b, w_b = jax.jit(meng_cell_weights_soa_onehot)(tables.meng, x, y, z)
    np.testing.assert_array_equal(np.asarray(p_a), np.asarray(p_b))
    np.testing.assert_allclose(np.asarray(w_a), np.asarray(w_b), rtol=0, atol=1e-5)


@pytest.mark.parametrize("mode,scene_name,tol", [
    ("jakob", "plane-srgb", 6e-3),  # q32 quantization (relative)
    ("meng", "cornell-srgb", 1e-5),  # exact walk, fusion drift only
])
def test_u32_format_matches_rows_render(mode, scene_name, tol):
    """End-to-end: identical RNG paths through both texel formats; the only
    difference is the texel representation."""
    cfg = RenderConfig(scene=scene_name, mode=mode, width=64, height=64,
                       spp=4, max_depth=5, texel_format="rows")
    a = _render(cfg)
    b = _render(cfg.replace(texel_format="u32"))
    scale = np.abs(a).max()
    assert np.abs(a - b).max() <= tol * scale, (
        np.abs(a - b).max(), scale)
