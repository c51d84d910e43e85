"""cfg.debug_checks: checkify float-check instrumentation of the render
(SURVEY.md section 5 "race detection / NaN guards").

The compute path is written where-before-divide (guarded denominators are
replaced, not masked after the fact), so a well-formed scene must trace
CLEAN under full float_checks -- that property is itself worth a test.  A
scene with a poisoned input must instead fail at the originating op with a
located error, not produce a silently-NaN image.
"""

import dataclasses

import jax
import numpy as np
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.renderer import _render_chunk
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


def _chunk(cfg, scene, tables, n_px=16):
    import jax.numpy as jnp

    px = jnp.arange(n_px, dtype=jnp.int32)
    return _render_chunk(scene, tables, cfg, jax.random.PRNGKey(0), px, 2)


@pytest.mark.parametrize("mode", ["rgb", "mallett"])
def test_clean_scene_traces_clean(mode):
    """Full float_checks over every op of the textured cornell render: no
    masked-lane divide may even *compute* a NaN/inf."""
    cfg = RenderConfig(scene="cornell-srgb", mode=mode, width=8, height=8,
                       spp=2, max_depth=4, debug_checks=True)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    sum_v, sum_a = _chunk(cfg, scene, tables)
    assert np.isfinite(np.asarray(sum_v)).all()

    # instrumentation must not change the estimate (checkify rewrites the
    # scan body, shifting XLA fusion/FMA choices: allow ~1 ulp-scale drift)
    cfg0 = cfg.replace(debug_checks=False)
    sum_v0, sum_a0 = _chunk(cfg0, scene, tables)
    np.testing.assert_allclose(np.asarray(sum_v), np.asarray(sum_v0),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sum_a), np.asarray(sum_a0))


def test_poisoned_material_raises_located_error():
    """A NaN planted in the albedo table must surface as a checkify error
    naming the failing op, not as a black image."""
    cfg = RenderConfig(scene="cornell", mode="mallett", width=8, height=8,
                       spp=2, max_depth=4, debug_checks=True)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    bad = np.asarray(scene.materials.albedo_values).copy()
    bad[:] = np.nan
    scene_bad = dataclasses.replace(
        scene, materials=dataclasses.replace(
            scene.materials, albedo_values=jax.numpy.asarray(bad)))

    with pytest.raises(Exception, match="(?i)nan"):
        _chunk(cfg, scene_bad, tables)


def test_degenerate_triangle_is_guarded():
    """Collapsing a light quad to zero area exercises the spherical-triangle
    degenerate guards: with ELS on, the NEE pdf path must stay finite (the
    reference reaches the same value via pdf=inf; we keep inv_pdf=0)."""
    cfg = RenderConfig(scene="cornell", mode="rgb", width=8, height=8,
                       spp=2, max_depth=4, debug_checks=True)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    tv = np.asarray(scene.tri_verts).copy()
    light_tris = np.asarray(scene.light_tris).reshape(-1)
    tv[light_tris] = tv[light_tris][:, :1]  # all three verts identical
    scene_deg = dataclasses.replace(scene, tri_verts=jax.numpy.asarray(tv))
    sum_v, _ = _chunk(cfg, scene_deg, tables)
    assert np.isfinite(np.asarray(sum_v)).all()
