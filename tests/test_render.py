"""Integrator oracles.

(a) direct-view emissive panel: pixel value == emission exactly (rgb mode)
    or == the D65 product-integral XYZ in expectation (spectral);
(b) cornell smoke render: finite, plausible alpha/stats;
(c) gradients w.r.t. material emission match finite differences (the
    BASELINE gradient check, on a tiny config).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.scene.library import _Builder, _HostMaterial
from simple_spectral_tpu.scene.types import make_camera
from simple_spectral_tpu.render.renderer import render_accumulate, render_image
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


def panel_scene(cfg, tables, emission_scale=1.0):
    """A single emissive quad filling the camera frustum."""
    b = _Builder(cfg, tables)
    b._camera = lambda: make_camera(
        (0.0, 0.0, 5.0), (0.0, 0.0, -1.0), (0.0, 1.0, 0.0), (512, 512), 45.0, 0.1, 1.0
    )
    if cfg.spectral:
        mat = b.add_material(
            "panel",
            _HostMaterial(
                albedo_spec=b.const_spectrum(0.0),
                emission_spec=tables.host["d65_rad"] * emission_scale,
            ),
        )
    else:
        mat = b.add_material(
            "panel",
            _HostMaterial(albedo_rgb=(0, 0, 0), emission_rgb=(0.25, 0.5, 0.75)),
        )
    s = 100.0
    b.add_quad(mat, (-s, -s, 0), (s, -s, 0), (s, s, 0), (-s, s, 0))
    return b.finish("panel")


def test_panel_rgb_exact():
    cfg = RenderConfig(scene="cornell", mode="rgb", width=8, height=8, spp=4)
    tables = build_color_tables(cfg)
    scene = panel_scene(cfg, tables)
    value, alpha = render_accumulate(cfg, scene, tables)
    assert np.allclose(alpha, 1.0)
    # every sample sees exactly the emission; zero variance
    assert np.allclose(value, [0.25, 0.5, 0.75], atol=1e-6)


def test_panel_spectral_matches_d65_xyz():
    cfg = RenderConfig(scene="cornell", mode="mallett", width=4, height=4, spp=512)
    tables = build_color_tables(cfg)
    scene = panel_scene(cfg, tables)
    value, alpha = render_accumulate(cfg, scene, tables)
    assert np.allclose(alpha, 1.0)
    expect = np.asarray(tables.d65_rad_xyz)
    got = value.reshape(-1, 3).mean(axis=0)
    # hero-wavelength MC over lambda_0: ~1/sqrt(16*512) relative noise
    assert np.abs(got - expect).max() / expect.max() < 2e-2, (got, expect)


def test_panel_indirect_only_is_black():
    cfg = RenderConfig(scene="cornell", mode="rgb", width=4, height=4, spp=2, indirect_only=True)
    tables = build_color_tables(cfg)
    scene = panel_scene(cfg, tables)
    value, alpha = render_accumulate(cfg, scene, tables)
    assert np.allclose(value, 0.0)
    assert np.allclose(alpha, 1.0)  # alpha still tracks hits


def test_cornell_smoke_stats():
    from simple_spectral_tpu.scene.library import build_scene

    cfg = RenderConfig(scene="cornell", mode="mallett", width=16, height=16, spp=8)
    tables = build_color_tables(cfg)
    value, alpha = render_accumulate(cfg, build_scene(cfg, tables), tables)
    assert np.isfinite(value).all()
    assert 0.8 < alpha.mean() <= 1.0
    # Y channel is nonnegative radiance
    assert value[..., 1].min() >= 0.0
    assert value[..., 1].max() > 0.0


def test_els_vs_brute_force_agree():
    """ELS on and off estimate the same integral; compare low-res means.

    This is the structural MIS-correctness check: emission gating plus NEE
    (reference src/renderer.cpp:167-220) must not double- or under-count."""
    from simple_spectral_tpu.scene.library import build_scene

    base = dict(scene="cornell", mode="rgb", width=8, height=8, max_depth=4)
    cfg_els = RenderConfig(spp=256, els=True, **base)
    cfg_bf = RenderConfig(spp=1024, els=False, **base)
    tables = build_color_tables(cfg_els)
    scene = build_scene(cfg_els, tables)
    v_els, _ = render_accumulate(cfg_els, scene, tables, seed=1)
    v_bf, _ = render_accumulate(cfg_bf, scene, tables, seed=2)
    m_els = v_els.mean(axis=(0, 1))
    m_bf = v_bf.mean(axis=(0, 1))
    # brute force at 8x8x1024 is still noisy; compare image means loosely
    assert np.abs(m_els - m_bf).max() / max(m_els.max(), 1e-9) < 0.15, (m_els, m_bf)


def test_gradient_matches_finite_difference():
    """d(image)/d(emission scale) via AD == finite differences (same seed =>
    same paths => the estimator is deterministic and differentiable)."""
    from simple_spectral_tpu.render.integrator import trace_lanes
    from simple_spectral_tpu.scene.library import build_scene

    cfg = RenderConfig(scene="cornell", mode="mallett", width=4, height=4, spp=1, max_depth=4)
    tables = build_color_tables(cfg)
    from simple_spectral_tpu.scene.library import build_scene

    scene = build_scene(cfg, tables)
    key = jax.random.PRNGKey(7)
    px = jnp.arange(16, dtype=jnp.int32)
    px_i, px_j = px % 4, px // 4

    base_emission = scene.materials.emission_values

    def objective(scale):
        m = scene.materials
        import dataclasses

        m2 = dataclasses.replace(m, emission_values=base_emission * scale)
        s2 = dataclasses.replace(scene, materials=m2)
        res = trace_lanes(s2, tables, cfg, key, px_i, px_j)
        return jnp.sum(res.value[:, 1])

    g = jax.grad(objective)(jnp.float32(1.0))
    h = 1e-2
    fd = (objective(jnp.float32(1.0 + h)) - objective(jnp.float32(1.0 - h))) / (2 * h)
    # radiance is linear in emission for direct light; near-linear overall
    assert np.isfinite(float(g))
    assert abs(float(g) - float(fd)) <= 2e-2 * max(abs(float(fd)), 1e-6), (float(g), float(fd))


@pytest.mark.parametrize("mode", ["rgb", "mallett", "meng", "jakob"])
def test_cornell_srgb_textured_smoke(mode):
    """cornell-srgb (textured left wall) in every color pipeline; exercises
    the per-texel deferred-upsample path (SceneData.texture rows) end to end."""
    from simple_spectral_tpu.scene.library import build_scene

    cfg = RenderConfig(scene="cornell-srgb", mode=mode, width=16, height=16, spp=4)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    value, alpha = render_accumulate(cfg, scene, tables)
    v = np.asarray(value)
    assert np.isfinite(v).all()
    assert v.max() > 1e-4  # something was lit
    assert np.asarray(alpha).mean() > 0.9  # mostly hits (closed box)


def test_unrolled_geometry_equals_scan():
    """cfg.unroll_geometry is a pure restructuring: identical RNG streams,
    identical estimates (bitwise-close) vs the lax.scan geometry loop."""
    import jax

    from simple_spectral_tpu.render.integrator import trace_lanes
    from simple_spectral_tpu.scene.library import build_scene

    cfg = RenderConfig(scene="cornell-srgb", mode="mallett", width=16,
                       height=16, spp=1, max_depth=5)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    px = jnp.arange(256, dtype=jnp.int32)
    key = jax.random.PRNGKey(11)

    r_unroll = jax.jit(
        lambda: trace_lanes(scene, tables, cfg, key, px % 16, px // 16)
    )()
    cfg2 = cfg.replace(unroll_geometry=False)
    r_scan = jax.jit(
        lambda: trace_lanes(scene, tables, cfg2, key, px % 16, px // 16)
    )()
    vu = np.asarray(r_unroll.value)
    vs = np.asarray(r_scan.value)
    # The two compilations fuse the bounce-1 hit-position arithmetic in
    # different orders; a 1-ulp position difference can flip a later
    # boundary decision on a FEW lanes (measured: divergence starts at the
    # second bounce, 0 lanes at max_depth=2).  Those lanes are measure-zero
    # estimator noise, not an error -- assert the overwhelming majority of
    # lanes identical and the aggregate equal at MC-irrelevant scale.
    same = np.isclose(vu, vs, rtol=1e-6, atol=1e-6).all(axis=-1)
    assert same.mean() > 0.95, f"only {same.mean():.3f} lanes identical"
    np.testing.assert_allclose(vu.mean(axis=0), vs.mean(axis=0), rtol=2e-3)
    np.testing.assert_array_equal(
        np.asarray(r_unroll.alpha), np.asarray(r_scan.alpha)
    )


def test_render_chunk_lanes_policy():
    """Chunk sizing is O(lanes)-aware (round 5): full max_lanes for the
    small built-in scenes, capped at 2^18 for BVH-scale scenes (the cull
    slab scales with cluster count) and for textured meng (its on-device
    grid walk is HBM-bound past 2^18 lanes; tools/cfg5_r05.json)."""
    from simple_spectral_tpu.render.renderer import render_chunk_lanes
    from simple_spectral_tpu.scene.library import build_scene

    cfg = RenderConfig(scene="cornell", mode="rgb", width=16, height=16)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    assert render_chunk_lanes(cfg, scene) == cfg.max_lanes

    cfg_m = RenderConfig(scene="cornell-srgb", mode="meng", width=16, height=16)
    t_m = build_color_tables(cfg_m)
    s_m = build_scene(cfg_m, t_m)
    assert render_chunk_lanes(cfg_m, s_m) == min(cfg_m.max_lanes, 1 << 18)

    cfg_s = RenderConfig(scene="cornell-stress", mode="rgb", width=16,
                         height=16, stress_boxes=60, stress_spheres=20)
    t_s = build_color_tables(cfg_s)
    s_s = build_scene(cfg_s, t_s)
    assert s_s.cull_tiles is not None
    assert render_chunk_lanes(cfg_s, s_s) == min(cfg_s.max_lanes, 1 << 18)
