"""Colorimetry oracles.

The reference contributes oracles, not tests (SURVEY.md section 4):
(a) lRGB->spectrum->XYZ->lRGB round trip, max f32 error ~1.851469e-5 over all
    24-bit colors (reference src/main.cpp:242-245);
(b) D65 normalization invariant D65(560nm)=100 (reference src/util/color.cpp:115);
(c) hero-sample XYZ estimator expectation == full product integral
    (reference src/util/color.hpp:106-139 give both).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.spectra import colorimetry as cm
from simple_spectral_tpu.spectra.spectrum import Spectrum


@pytest.fixture(scope="module")
def tables1931():
    return cm.build_color_tables(RenderConfig(mode="mallett", observer=1931))


@pytest.fixture(scope="module")
def tables2006():
    return cm.build_color_tables(RenderConfig(mode="mallett", observer=2006))


def test_d65_invariant(tables1931):
    # reference src/util/color.cpp:115: D65_orig(560nm) == 100 exactly.
    d65_orig = tables1931.host["d65_orig"]
    assert d65_orig.sample_linear(560.0) == 100.0


def test_d65_chromaticity(tables1931):
    xyz = tables1931.host["d65_rad_xyz"]
    xy = xyz[:2] / xyz.sum()
    # CIE D65 chromaticity (x, y) ~ (0.31271, 0.32902).
    assert np.allclose(xy, [0.31272, 0.32903], atol=2e-4)


def test_matrix_roundtrip(tables1931):
    m = tables1931.host["matr_lrgb_to_xyz"]
    minv = tables1931.host["matr_xyz_to_lrgb"]
    assert np.abs(m @ minv - np.eye(3)).max() < 1e-12


def test_white_maps_to_whitepoint(tables1931):
    # M @ (1,1,1) must equal the D65 whitepoint XYZ by construction
    # (reference src/util/color.cpp:147-154).
    m = tables1931.host["matr_lrgb_to_xyz"]
    w = tables1931.host["d65_rad_xyz"]
    assert np.abs(m @ np.ones(3) - w).max() / np.abs(w).max() < 1e-12


def test_round_trip_1931_oracle(tables1931, rng):
    """Round trip error must be within the documented f32 bound ~1.85e-5."""
    corners = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
        dtype=np.float32,
    )
    batch = np.concatenate([corners, rng.random((50000, 3), dtype=np.float32)])
    out = np.asarray(cm.round_trip_lrgb(tables1931, jnp.asarray(batch)))
    assert np.abs(out - batch).max() < 1.9e-5


def test_round_trip_2006(tables2006, rng):
    """The 2006 basis round trip (reference cannot even run this through its
    own operator* grid-compat asserts; src/spectrum.cpp:79-85).  The 2006
    basis data itself carries ~1.6e-4 residual through this pipeline."""
    batch = rng.random((5000, 3), dtype=np.float32)
    out = np.asarray(cm.round_trip_lrgb(tables2006, jnp.asarray(batch)))
    assert np.abs(out - batch).max() < 5e-4


def test_gamma_roundtrip(rng):
    x = jnp.asarray(rng.random(10000, dtype=np.float32))
    y = cm.srgb_to_lrgb(cm.lrgb_to_srgb(x))
    # f32 pow() carries a few ulp; 2e-5 is the same scale as the documented
    # whole-pipeline oracle (reference src/main.cpp:242-245).
    assert np.abs(np.asarray(y) - np.asarray(x)).max() < 2e-5
    # spot values of the exact sRGB piecewise curve; the two branches meet at
    # the knee only to ~1.5e-5 (true of the standard itself).
    assert np.allclose(np.asarray(cm.lrgb_to_srgb(jnp.asarray([0.0, 1.0]))), [0.0, 1.0])
    assert abs(float(cm.lrgb_to_srgb(jnp.asarray(0.0031308))) - 12.92 * 0.0031308) < 5e-5


@pytest.mark.parametrize("observer", [1931, 2006])
def test_hero_estimator_unbiased(observer):
    """E_lambda0[hero XYZ estimate] == product integral of the linear
    reconstructions (reference src/util/color.hpp:106-139 A/B pair)."""
    cfg = RenderConfig(mode="mallett", observer=observer)
    t = cm.build_color_tables(cfg)
    # an arbitrary smooth flux spectrum on the observer range
    lo, hi = cfg.lambda_min, cfg.lambda_max
    k = 101
    lams = np.linspace(lo, hi, k)
    flux_vals = 1.0 + np.sin(lams / 40.0) ** 2
    flux = Spectrum(flux_vals, lo, hi)

    # dense sweep of lambda_0 over the first band
    n0 = 4096
    lam0 = jnp.asarray(lo + (np.arange(n0) + 0.5) / n0 * cfg.lambda_step, dtype=jnp.float32)
    from simple_spectral_tpu.spectra.spectrum import hero_wavelengths, sample_linear

    hero_lams = hero_wavelengths(lam0, cfg.n_wavelengths, cfg.lambda_step)
    flux_hero = sample_linear(
        jnp.asarray(flux.values, jnp.float32), flux.low, 1.0 / flux.step, hero_lams
    )
    xyz_est = cm.specradflux_to_ciexyz_hero(
        t, flux_hero, lam0, cfg.n_wavelengths, cfg.lambda_step
    )
    mean_est = np.asarray(xyz_est).mean(axis=0)

    # ground truth: fine-grid numeric integral of obs_lin * flux_lin
    fine = np.linspace(lo - 5, hi + 5, 20001)
    flux_f = flux.sample_linear(fine)
    truth = np.array(
        [np.trapezoid(o.sample_linear(fine) * flux_f, fine) for o in t.host["obs"]]
    )
    assert np.abs(mean_est - truth).max() / truth.max() < 1e-3


def test_meng_matrices_are_near_inverses():
    prod = cm.MENG_M_RGB_TO_XYZ @ cm.MENG_M_XYZ_TO_RGB
    assert np.abs(prod - np.eye(3)).max() < 5e-3  # they are published, imprecise values


@pytest.mark.parametrize("observer", [1931, 2006])
def test_hero_estimator_window_matches_general(observer):
    """The shifted-window SoA estimator (lambda_min supplied; round 5) must
    equal the general [K, S, N] hat-contraction form."""
    cfg = RenderConfig(mode="mallett", observer=observer)
    t = cm.build_color_tables(cfg)
    rng = np.random.default_rng(11)
    n = 4096
    lam0 = jnp.asarray(
        cfg.lambda_min + rng.random(n) * cfg.lambda_step, jnp.float32
    )
    flux = jnp.asarray(rng.random((cfg.n_wavelengths, n)), jnp.float32)
    a = cm.specradflux_to_ciexyz_hero_soa(
        t, flux, lam0, cfg.n_wavelengths, cfg.lambda_step
    )
    b = cm.specradflux_to_ciexyz_hero_soa(
        t, flux, lam0, cfg.n_wavelengths, cfg.lambda_step,
        lambda_min=cfg.lambda_min,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4)
    # band edges: lambda_0 at the very start of the first band
    lam_edge = jnp.full((8,), np.float32(cfg.lambda_min))
    fe = jnp.ones((cfg.n_wavelengths, 8), jnp.float32)
    ae = cm.specradflux_to_ciexyz_hero_soa(
        t, fe, lam_edge, cfg.n_wavelengths, cfg.lambda_step)
    be = cm.specradflux_to_ciexyz_hero_soa(
        t, fe, lam_edge, cfg.n_wavelengths, cfg.lambda_step,
        lambda_min=cfg.lambda_min)
    np.testing.assert_allclose(np.asarray(ae), np.asarray(be), rtol=1e-5, atol=1e-4)
