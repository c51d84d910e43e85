"""Branchless material shading over a flat batch of hits.

The reference dispatches virtually over ``MaterialBase*`` (reference
src/material.cpp); here materials are rows of a dense table and every lane
evaluates all variants cheaply with ``where``-selects -- the TPU-native
equivalent of the tagged union (reference src/material.hpp:117-150).

``S`` is the per-lane radiance vector width: ``cfg.n_wavelengths`` hero
samples in spectral modes, 3 (lRGB) in rgb mode.
"""

from __future__ import annotations

import jax.numpy as jnp

from simple_spectral_tpu.config import (
    MODE_JAKOB,
    MODE_MALLETT,
    MODE_MENG,
    MODE_RGB,
    RenderConfig,
)
from simple_spectral_tpu.scene.types import ALBEDO_TEXTURE, BSDF_MIRROR, SceneData
from simple_spectral_tpu.spectra.colorimetry import ColorTables, srgb_to_lrgb
from simple_spectral_tpu.spectra.spectrum import sample_hero_batched
from simple_spectral_tpu.spectra.upsample_mallett import lrgb_to_specrefl_mallett

PI = 3.14159265358979323846


def lrgb_to_specrefl(tables: ColorTables, cfg: RenderConfig, lrgb, lam0):
    """Mode dispatch of the paper's central operation: lRGB -> hero-sampled
    reflectance (reference src/util/color.cpp:166-235)."""
    if cfg.mode == MODE_MALLETT:
        return lrgb_to_specrefl_mallett(tables, lrgb, lam0, cfg.n_wavelengths, cfg.lambda_step)
    if cfg.mode == MODE_MENG:
        from simple_spectral_tpu.spectra.upsample_meng import lrgb_to_specrefl_meng

        return lrgb_to_specrefl_meng(tables, lrgb, lam0, cfg.n_wavelengths, cfg.lambda_step)
    if cfg.mode == MODE_JAKOB:
        from simple_spectral_tpu.spectra.upsample_jakob import lrgb_to_specrefl_jakob

        return lrgb_to_specrefl_jakob(tables, lrgb, lam0, cfg.n_wavelengths, cfg.lambda_step)
    raise ValueError(f"no spectral upsampling in mode {cfg.mode!r}")


def sample_texture_lrgb(scene: SceneData, st):
    """Clamped nearest-neighbor sRGB texture fetch -> lRGB (reference
    src/material.cpp:66-97: ST -> UV -> index with vertical flip)."""
    tex = scene.texture  # u8[H, W, 3], scanlines top-to-bottom
    h, w = tex.shape[0], tex.shape[1]
    i = jnp.clip(jnp.floor(st[..., 0] * w).astype(jnp.int32), 0, w - 1)
    j = jnp.clip(jnp.floor(h - st[..., 1] * h).astype(jnp.int32), 0, h - 1)
    srgb = tex[j, i].astype(jnp.float32) * (1.0 / 255.0)
    return srgb_to_lrgb(srgb)


def evaluate_emission(scene: SceneData, tables, cfg: RenderConfig, mat, st, lam0):
    """Emitted radiance sample, direction-independent (reference
    src/material.hpp:101-108).  mat: i32[N] -> f32[N,S]."""
    m = scene.materials
    if cfg.spectral:
        return sample_hero_batched(
            m.emission_values[mat],
            m.emission_low[mat],
            m.emission_inv_step[mat],
            lam0,
            cfg.n_wavelengths,
            cfg.lambda_step,
        )
    return m.emission_rgb[mat]


def evaluate_albedo(scene: SceneData, tables, cfg: RenderConfig, mat, st, lam0):
    """Albedo sample: constant spectrum / constant RGB / on-the-fly spectral
    upsample of an sRGB texel (the paper's headline trick; reference
    src/material.cpp:45-64).  -> f32[N,S]."""
    m = scene.materials
    if cfg.spectral:
        const = sample_hero_batched(
            m.albedo_values[mat],
            m.albedo_low[mat],
            m.albedo_inv_step[mat],
            lam0,
            cfg.n_wavelengths,
            cfg.lambda_step,
        )
    else:
        const = m.albedo_rgb[mat]
    if scene.texture is None:
        return const
    lrgb = sample_texture_lrgb(scene, st)
    texv = lrgb_to_specrefl(tables, cfg, lrgb, lam0) if cfg.spectral else lrgb
    is_tex = (m.albedo_kind[mat] == ALBEDO_TEXTURE)[..., None]
    return jnp.where(is_tex, texv, const)


def evaluate_bsdf(scene, tables, cfg, mat, st, lam0):
    """BSDF value for a given (implicit) w_i from NEE.  Mirrors are Dirac
    deltas: impossible to hit, value 0 (reference src/material.cpp:146-152).
    -> f32[N,S]."""
    albedo = evaluate_albedo(scene, tables, cfg, mat, st, lam0)
    is_mirror = (scene.materials.bsdf_type[mat] == BSDF_MIRROR)[..., None]
    return jnp.where(is_mirror, 0.0, albedo * (1.0 / PI))


def interact_bsdf(key, scene, tables, cfg, mat, st, lam0, w_o, normal):
    """Sample the BSDF: cosine-hemisphere for Lambertian (reference
    src/material.cpp:130-143), reflection with a delta pdf for mirrors
    (src/material.cpp:154-167).

    Returns (w_i f32[N,3], pdf f32[N], f_s f32[N,S], is_delta bool[N]).
    The delta pdf is returned as +inf, exactly as the reference's sentinel
    (the integrator converts it to the n.l := 1, pdf := 1 convention,
    reference src/renderer.cpp:234-243).
    """
    from simple_spectral_tpu.render.sampling import rand_coshemi, reflect, rotated_to

    albedo = evaluate_albedo(scene, tables, cfg, mat, st, lam0)
    local, pdf_lam = rand_coshemi(key, mat.shape, cfg.eps)
    w_i_lam = rotated_to(local, normal)
    w_i_mir = reflect(w_o, normal)

    is_mirror = scene.materials.bsdf_type[mat] == BSDF_MIRROR
    w_i = jnp.where(is_mirror[..., None], w_i_mir, w_i_lam)
    pdf = jnp.where(is_mirror, jnp.inf, pdf_lam)
    f_s = jnp.where(is_mirror[..., None], albedo, albedo * (1.0 / PI))
    return w_i, pdf, f_s, is_mirror
