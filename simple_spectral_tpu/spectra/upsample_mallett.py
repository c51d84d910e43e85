"""Mallett-Yuksel sRGB spectral-primary decomposition ("Ours").

lrgb -> hero-sampled spectral reflectance as a linear combination of the three
basis spectra (reference src/util/color.cpp:166-173).  The whole operation is
three table gathers plus an FMA per wavelength -- pure VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp

from simple_spectral_tpu.spectra.colorimetry import ColorTables
from simple_spectral_tpu.spectra.spectrum import hero_wavelengths, sample_linear


def lrgb_to_specrefl_mallett(
    tables: ColorTables, lrgb, lambda_0, n_wavelengths: int, lambda_step: float
):
    """lrgb: f32[...,3]; lambda_0: f32[...] -> f32[..., S] reflectance sample."""
    lams = hero_wavelengths(lambda_0, n_wavelengths, lambda_step)  # [..., S]
    out = 0.0
    for c in range(3):
        basis_c = sample_linear(
            tables.basis_values[c], tables.basis_low, tables.basis_inv_step, lams
        )
        out = out + lrgb[..., c, None] * basis_c
    return out
