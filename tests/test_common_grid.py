"""Common-lattice material resample (scene/library.py _common_grid_resample
+ render/shading.py sample_all_common): the MXU formulation must be EXACT
against the per-material hat path, not merely close -- the lattice is chosen
so every material's breakpoints are shared nodes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.shading import precompute_constant_spectra
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables

CASES = [
    ("cornell", 1931), ("cornell", 2006),
    ("cornell-srgb", 1931), ("cornell-srgb", 2006),
    ("plane-srgb", 1931),
]


@pytest.mark.parametrize("scene_name,observer", CASES)
def test_grid_found_and_paths_agree(scene_name, observer):
    cfg = RenderConfig(scene=scene_name, mode="mallett", observer=observer,
                       width=8, height=8, spp=1)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    mats = scene.materials
    # every shipped scene's spectra live on commensurate lattices
    assert mats.albedo_grid is not None, scene_name
    assert mats.emission_grid is not None, scene_name
    g_low, g_step, kc = mats.albedo_grid
    assert g_low <= cfg.lambda_min - g_step and kc <= 4096

    n = 4096
    lam0 = cfg.lambda_min + np.linspace(0.0, 1.0, n, dtype=np.float32) * cfg.lambda_step
    lam0 = jnp.asarray(lam0)

    fast = precompute_constant_spectra(scene, cfg, lam0)
    scene_slow = dataclasses.replace(
        scene, materials=dataclasses.replace(
            mats, albedo_grid=None, emission_grid=None,
            albedo_resample=None, emission_resample=None))
    slow = precompute_constant_spectra(scene_slow, cfg, lam0)

    for key in ("albedo", "emission"):
        a, b = np.asarray(fast[key]), np.asarray(slow[key])
        scale = max(np.abs(b).max(), 1e-6)
        # the two formulations evaluate the hat argument at different float
        # magnitudes (shifted window ~R vs full lattice coordinate ~Kc), so
        # they agree only to ulp(Kc) ~ 8e-6 in the weights -- the shifted
        # form is the lower-magnitude (more accurate) one
        np.testing.assert_allclose(a / scale, b / scale, atol=1.5e-5,
                                   err_msg=f"{scene_name}/{observer}/{key}")


def test_resample_reproduces_host_spectra_exactly():
    """R @ values at the shared nodes == the host-side f64 linear sample of
    each original spectrum (the exactness property the docstring claims)."""
    from simple_spectral_tpu.scene.library import _common_grid_resample
    from simple_spectral_tpu.spectra.spectrum import Spectrum

    specs = [
        Spectrum(np.linspace(0.1, 0.9, 76), 400.0, 700.0),   # 4 nm walls
        Spectrum(np.asarray([0.0, 3.0, 1.0, 2.0]), 400.0, 700.0),  # 100 nm light
        Spectrum.constant(1.0, 380.0, 780.0),                # K=2 constant
    ]
    k_pad = max(s.values.size for s in specs)
    grid, r = _common_grid_resample(specs, k_pad, 380.0, 780.0)
    assert grid is not None
    g_low, g_step, kc = grid
    nodes = g_low + g_step * np.arange(kc)
    for i, s in enumerate(specs):
        vals = np.zeros(k_pad, np.float32)
        vals[: s.values.size] = s.values
        got = r[i] @ vals
        want = s.sample_linear(nodes)
        np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-6)


def test_incommensurate_grids_fall_back():
    from simple_spectral_tpu.scene.library import _common_grid_resample
    from simple_spectral_tpu.spectra.spectrum import Spectrum

    specs = [
        Spectrum(np.ones(10), 400.0, 700.0),
        Spectrum(np.ones(7), 400.0 + np.pi, 700.0),  # irrational offset
    ]
    grid, r = _common_grid_resample(specs, 10, 380.0, 780.0)
    # either refused (no exact lattice at sane size) -- the required behavior
    assert grid is None and r is None
