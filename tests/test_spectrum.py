"""Spectrum core: sampling semantics, arithmetic, integrals.

Host Spectrum mirrors reference src/spectrum.cpp; device sampling primitives
must agree with the host implementation bit-for-bit in float32.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_spectral_tpu.spectra.spectrum import (
    Spectrum,
    load_spectral_csv,
    sample_linear,
    sample_nearest,
    sample_hero_batched,
    hero_wavelengths,
)


def test_load_csv_shapes():
    cols = load_spectral_csv("cie1931-xyzbar-380+5+780.csv")
    assert len(cols) == 3 and all(c.size == 81 for c in cols)
    cols = load_spectral_csv("scenes/cornell/light.csv")
    assert len(cols) == 1 and cols[0].size == 4
    cols = load_spectral_csv("scenes/cornell/white-green-red.csv")
    assert len(cols) == 3 and all(c.size == 76 for c in cols)


def test_linear_sampling_zero_outside():
    s = Spectrum(np.array([1.0, 2.0, 3.0]), 400, 500)
    assert s.sample_linear(399.0) < 1.0  # ramps from 0 outside
    assert s.sample_linear(400.0) == 1.0
    assert s.sample_linear(425.0) == 1.5
    assert s.sample_linear(500.0) == 3.0
    assert s.sample_linear(551.0) == 0.0
    assert s.sample_linear(300.0) == 0.0


def test_nearest_sampling():
    s = Spectrum(np.array([1.0, 2.0, 3.0]), 400, 500)
    assert s.sample_nearest(420.0) == 1.0
    assert s.sample_nearest(430.0) == 2.0
    assert s.sample_nearest(551.0) == 0.0


def test_device_matches_host(rng):
    vals = rng.random(81)
    s = Spectrum(vals, 380, 780)
    lams = rng.uniform(300, 900, size=4096)
    host = s.sample_linear(lams).astype(np.float32)
    dev = np.asarray(
        sample_linear(jnp.asarray(vals, jnp.float32), 380.0, 1.0 / s.step, jnp.asarray(lams, jnp.float32))
    )
    assert np.abs(host - dev).max() < 1e-5
    host_n = s.sample_nearest(lams).astype(np.float32)
    dev_n = np.asarray(
        sample_nearest(jnp.asarray(vals, jnp.float32), 380.0, 1.0 / s.step, jnp.asarray(lams, jnp.float32))
    )
    assert np.abs(host_n - dev_n).max() < 1e-6


def test_hero_batched(rng):
    # two spectra with different ranges, as in per-material tables
    a = Spectrum(rng.random(76), 400, 700)
    b = Spectrum(rng.random(97), 300, 780)
    kmax = 97
    values = np.zeros((2, kmax), dtype=np.float32)
    values[0, :76] = a.values
    values[1, :97] = b.values
    low = np.array([400.0, 300.0], dtype=np.float32)
    inv_step = np.array([1.0 / a.step, 1.0 / b.step], dtype=np.float32)
    lam0 = np.array([430.0, 430.0], dtype=np.float32)
    out = np.asarray(
        sample_hero_batched(
            jnp.asarray(values), jnp.asarray(low), jnp.asarray(inv_step), jnp.asarray(lam0), 4, 100.0
        )
    )
    # NOTE: padding zeros beyond each spectrum's true extent are never reached:
    # wavelengths beyond `high` map to indices >= count only when the true
    # spectrum is zero there anyway... but padded rows have count < kmax, so
    # check directly against host sampling.
    lams = np.array([430.0, 530.0, 630.0, 730.0])
    assert np.abs(out[0] - a.sample_linear(lams).astype(np.float32)).max() < 2e-5
    assert np.abs(out[1] - b.sample_linear(lams).astype(np.float32)).max() < 2e-5


def test_hero_wavelengths():
    out = np.asarray(hero_wavelengths(jnp.asarray([380.0]), 4, 100.0))
    assert np.allclose(out, [[380.0, 480.0, 580.0, 680.0]])


def test_product_integral_matches_reference_formula():
    # identical grids -> trapezoid on shared nodes +- one step
    a = Spectrum(np.array([1.0, 2.0, 3.0, 2.0, 1.0]), 400, 600)
    b = Spectrum(np.array([2.0, 2.0, 2.0, 2.0, 2.0]), 400, 600)
    val = Spectrum.integrate_product(a, b)
    # manual: nodes 350..650 step 50; product at nodes: 0,2,4,6,4,2,0 (x2 each)
    pts = np.arange(350.0, 651.0, 50.0)
    pa = a.sample_linear(pts)
    pb = b.sample_linear(pts)
    prod = pa * pb
    manual = np.sum(0.5 * (prod[:-1] + prod[1:]) * 50.0)
    assert abs(val - manual) < 1e-9


def test_product_integral_mismatched_grids():
    # D65-style [300,780]@5 against 2006 observer [390,830]@1
    a = Spectrum(np.ones(97), 300, 780)
    b = Spectrum(np.ones(441), 390, 830)
    val = Spectrum.integrate_product(a, b)
    # overlap of the supports is [390, 780] where the product is ~1; the ramps
    # outside contribute ~half a step each side.
    assert abs(val - 390.0) < 6.0


def test_spectrum_mul_add():
    a = Spectrum(np.array([1.0, 2.0, 3.0]), 400, 500)
    b = Spectrum(np.array([2.0, 2.0, 2.0]), 400, 500)
    assert np.allclose((a * b).values, [2, 4, 6])
    assert np.allclose((a + b).values, [3, 4, 5])
    assert np.allclose((a * 2.0).values, [2, 4, 6])
    assert (a * b).low == 400 and (a * b).high == 500


def test_integrate_midpoint():
    a = Spectrum(np.array([1.0, 2.0, 3.0]), 400, 500)
    assert abs(a.integrate() - 6.0 * 50.0) < 1e-12
