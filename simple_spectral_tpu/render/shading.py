"""Branchless material shading over a flat batch of hits (SoA layout).

The reference dispatches virtually over ``MaterialBase*`` (reference
src/material.cpp); here materials are rows of a dense table.  Per-lane
spectra are ``f32[S, N]`` -- hero-wavelength samples on the sublane axis,
lanes on the 128-wide vector axis (see render/vec.py for the layout rule).

Table sampling strategy: a per-lane linear-interp gather from a per-material
spectrum table is expressed as a *hat-function contraction*
``v[s,n] = sum_k row[k,n] * max(0, 1-|x[s,n]-k|)``, which is exactly linear
reconstruction with the reference's zero-outside-range semantics (reference
src/spectrum.cpp:39-60) but runs as fused multiply-reduce on the VPU instead
of per-lane gathers.  Row selection over the (tiny) material axis is a
one-hot matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import (
    MODE_JAKOB,
    MODE_MALLETT,
    MODE_MENG,
    RenderConfig,
)
from simple_spectral_tpu.render.vec import V3
from simple_spectral_tpu.scene.types import ALBEDO_TEXTURE, BSDF_MIRROR, SceneData
from simple_spectral_tpu.spectra.colorimetry import ColorTables

PI = 3.14159265358979323846
_HI = jax.lax.Precision.HIGHEST  # color math must not drop to bf16


def material_onehot(n_materials: int, mat):
    """i32[N] -> f32[M, N] one-hot."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_materials, 1), 0)
    return (iota == mat[None, :]).astype(jnp.float32)


def select_column(column, mat, n_materials: int):
    """f32[M] gathered at i32[N] -> f32[N], as a static where-chain (M is
    tiny and static, so this is M selects, no gather)."""
    out = jnp.full(mat.shape, column[0])
    for m in range(1, n_materials):
        out = jnp.where(mat == m, column[m], out)
    return out


from simple_spectral_tpu.spectra.spectrum import hat_weights, hero_lams_soa as hero_lams


def sample_rows_hero(rows, low, inv_step, lam0, n_wavelengths: int, lambda_step: float):
    """rows: f32[K, N] per-lane spectrum; low/inv_step: f32[N] -> f32[S, N]."""
    lams = hero_lams(lam0, n_wavelengths, lambda_step)  # [S, N]
    x = (lams - low[None, :]) * inv_step[None, :]
    w = hat_weights(x, rows.shape[0])  # [K, S, N]
    return jnp.sum(rows[:, None, :] * w, axis=0)


def material_rows(values, oh):
    """values: f32[M, K]; oh: f32[M, N] -> per-lane rows f32[K, N]."""
    return jnp.einsum("mk,mn->kn", values, oh, precision=_HI)


def precompute_constant_spectra(scene: SceneData, cfg: RenderConfig, lam0):
    """Hero samples of every material's constant albedo/emission spectrum,
    evaluated ONCE per camera sample: they depend only on lam0, not on the
    bounce, so hoisting them out of the depth loop replaces a K-point hat
    contraction per bounce with an M-point one-hot select.  -> dict of
    f32[M, S, N] (spectral modes) or f32[M, 3, N]-equivalent einsum inputs
    (rgb mode uses the raw [M, 3] tables directly)."""
    m = scene.materials
    if not cfg.spectral:
        return {"albedo": None, "emission": None}
    lams = hero_lams(lam0, cfg.n_wavelengths, cfg.lambda_step)  # [S, N]

    def sample_all(values, low, inv_step):
        # values: f32[M, K]; low/inv_step: f32[M] -> f32[M, S, N]
        x = (lams[None, :, :] - low[:, None, None]) * inv_step[:, None, None]
        k_dim = values.shape[1]
        w = hat_weights(x, k_dim)  # [K, M, S, N]
        return jnp.sum(values.T[:, :, None, None] * w, axis=0)

    cache = {
        "albedo": sample_all(m.albedo_values, m.albedo_low, m.albedo_inv_step),
        "emission": sample_all(m.emission_values, m.emission_low, m.emission_inv_step),
    }
    return cache


def precompute_basis_hero(tables: ColorTables, cfg: RenderConfig, lam0):
    """Mallett-Yuksel r/g/b basis spectra sampled at the hero wavelengths,
    f32[3, S, N].  Depends only on lam0, so the per-bounce texture upsample
    collapses from a K-point hat contraction (the [K, S, N] weight tensor
    cannot be hoisted out of the compiled depth loop -- XLA will not move a
    VMEM-busting loop-invariant) to three FMAs per (wavelength, lane)."""
    lams = hero_lams(lam0, cfg.n_wavelengths, cfg.lambda_step)  # [S, N]
    x = (lams - tables.basis_low) * tables.basis_inv_step
    w = hat_weights(x, tables.basis_values.shape[1])  # [K, S, N]
    # basis_values: f32[3, K] -> bh[c, s, n]
    return jnp.einsum("ck,ksn->csn", tables.basis_values, w, precision=_HI)


def evaluate_emission_cached(scene: SceneData, cfg: RenderConfig, cache, oh):
    """Emitted radiance sample, direction-independent (reference
    src/material.hpp:101-108).  oh: f32[M, N] one-hot -> f32[S, N]."""
    if cfg.spectral:
        return jnp.einsum("msn,mn->sn", cache["emission"], oh, precision=_HI)
    return jnp.einsum("mc,mn->cn", scene.materials.emission_rgb, oh, precision=_HI)


def texel_index(scene: SceneData, st_s, st_t):
    """Clamped nearest-neighbor ST -> flat texel index with vertical flip
    (reference src/material.cpp:66-97), as pure int math for the geometry
    phase -- the actual fetch is deferred to the shading phase."""
    w, h = scene.tex_res
    i = jnp.clip(jnp.floor(st_s * w).astype(jnp.int32), 0, w - 1)
    j = jnp.clip(jnp.floor(h - st_t * h).astype(jnp.int32), 0, h - 1)
    return j * w + i


def texel_fetch_lrgb(scene: SceneData, tex_idx):
    """Fetch packed texels at precomputed flat indices -> linear RGB
    (r, g, b) f32[N] (reference src/material.cpp:45-64 pipeline: sRGB u8 ->
    f32 -> srgb_to_lrgb).  The texture ships pre-packed as one u32 per texel
    (scene.types packs 0xRRGGBB) so this is a single gather."""
    from simple_spectral_tpu.spectra.colorimetry import srgb_to_lrgb

    packed = jnp.take(scene.texture, tex_idx, axis=0)
    scale = 1.0 / 255.0
    r = ((packed >> 16) & 0xFF).astype(jnp.float32) * scale
    g = ((packed >> 8) & 0xFF).astype(jnp.float32) * scale
    b = (packed & 0xFF).astype(jnp.float32) * scale
    return srgb_to_lrgb(r), srgb_to_lrgb(g), srgb_to_lrgb(b)


def texture_albedo_deferred(scene: SceneData, tables, cfg: RenderConfig, cache, tex_idx, lam0):
    """Per-bounce textured-albedo evaluation for the shading phase: one texel
    row gather + dense math, per color pipeline.

    - rgb:      packed-u32 gather -> lRGB                      -> f32[3, N]
    - mallett:  packed-u32 gather, refl = r R + g G + b B with the basis
                pre-sampled at the hero wavelengths (linear in lRGB, exact)
    - jakob:    f32[T,3] row gather of precomputed sigmoid coefficients
                (cube fetch hoisted to scene build), 3 FMA + rsqrt per (s,n)
    - meng:     f32[T,12] row gather of precomputed (point ids, weights);
                spectra contraction over grid points on the MXU, then a hat
                contraction to the per-lane hero wavelengths
    All table gathers beyond the single texel row are eliminated -- XLA's
    TPU gather costs ~7 ns per index, so the reference's per-hit grid/cube
    walks (reference src/util/color.cpp:166-235) are the wrong shape for
    this hardware.
    """
    if not cfg.spectral:
        r, g, b = texel_fetch_lrgb(scene, tex_idx)
        return jnp.stack([r, g, b])
    if cfg.mode == MODE_MALLETT:
        r, g, b = texel_fetch_lrgb(scene, tex_idx)
        bh = cache["basis_hero"]  # [3, S, N]
        return bh[0] * r[None, :] + bh[1] * g[None, :] + bh[2] * b[None, :]
    if cfg.mode == MODE_JAKOB:
        from simple_spectral_tpu.spectra.upsample_jakob import rgb2spec_eval_soa

        rows = jnp.take(scene.tex_aux, tex_idx, axis=0)  # [N, 3]
        lams = hero_lams(lam0, cfg.n_wavelengths, cfg.lambda_step)
        return rgb2spec_eval_soa(rows[:, 0], rows[:, 1], rows[:, 2], lams)
    if cfg.mode == MODE_MENG:
        rows = jnp.take(scene.tex_aux, tex_idx, axis=0)  # [N, 12]
        pidx = rows[:, :6].astype(jnp.int32)  # [N, 6]
        w = rows[:, 6:]  # [N, 6]
        meng = tables.meng
        spec = meng["pts_spectrum"]  # [P, K]
        n_pts = spec.shape[0]
        # omega[p, n] = sum_slot w[n, slot] * [pidx[n, slot] == p]
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (n_pts, 1), 0)
        omega = jnp.zeros((n_pts, tex_idx.shape[0]), jnp.float32)
        for slot in range(6):
            omega = omega + jnp.where(
                iota_p == pidx[:, slot][None, :], w[:, slot][None, :], 0.0
            )
        # q[k, n] = sum_p spec[p, k] * omega[p, n]  (MXU)
        q = jnp.einsum("pk,pn->kn", spec, omega, precision=_HI)
        # hero-wavelength reconstruction: linear interp over the K bins,
        # clamped to the table edges (the CIE-2006 extension; see
        # spectra/upsample_meng.py module docstring)
        lams = hero_lams(lam0, cfg.n_wavelengths, cfg.lambda_step)
        k_dim = spec.shape[1]
        x = (lams - meng["lam_min"]) / (meng["lam_max"] - meng["lam_min"]) * (k_dim - 1)
        x = jnp.clip(x, 0.0, k_dim - 1)
        wk = hat_weights(x, k_dim)  # [K, S, N]
        return jnp.sum(q[:, None, :] * wk, axis=0)
    raise ValueError(f"unsupported mode {cfg.mode!r}")


def sample_texture_lrgb(scene: SceneData, st_s, st_t):
    """Clamped nearest-neighbor sRGB texture fetch -> lRGB (reference
    src/material.cpp:66-97: ST -> UV -> index with vertical flip).
    Returns (r, g, b) f32[N] in *linear* RGB.

    The texture ships pre-packed as one u32 per texel (scene.types packs
    0xRRGGBB) so the random-access fetch is a single gather instead of
    three -- gathers dominate the textured-scene profile on TPU."""
    from simple_spectral_tpu.spectra.colorimetry import srgb_to_lrgb

    tex = scene.texture  # u32[H*W] packed 0xRRGGBB, scanlines top-to-bottom
    w, h = scene.tex_res
    i = jnp.clip(jnp.floor(st_s * w).astype(jnp.int32), 0, w - 1)
    j = jnp.clip(jnp.floor(h - st_t * h).astype(jnp.int32), 0, h - 1)
    packed = jnp.take(tex, j * w + i, axis=0)
    scale = 1.0 / 255.0
    r = ((packed >> 16) & 0xFF).astype(jnp.float32) * scale
    g = ((packed >> 8) & 0xFF).astype(jnp.float32) * scale
    b = (packed & 0xFF).astype(jnp.float32) * scale
    return srgb_to_lrgb(r), srgb_to_lrgb(g), srgb_to_lrgb(b)


def lrgb_to_specrefl_soa(
    tables: ColorTables, cfg: RenderConfig, r, g, b, lam0, basis_hero=None
):
    """Mode dispatch of the paper's central operation: lRGB -> hero-sampled
    reflectance f32[S, N] (reference src/util/color.cpp:166-235).

    ``basis_hero`` (f32[3, S, N], from precompute_basis_hero) short-circuits
    the Mallett path to refl = r*R(hero) + g*G(hero) + b*B(hero) -- the
    decomposition is linear in lRGB, so this is exact."""
    if cfg.mode == MODE_MALLETT:
        if basis_hero is not None:
            return (
                basis_hero[0] * r[None, :]
                + basis_hero[1] * g[None, :]
                + basis_hero[2] * b[None, :]
            )
        # basisdot[k, n] = sum_c basis[c, k] * rgb_c[n]; then hat-contract.
        rgb = jnp.stack([r, g, b])  # [3, N]
        basisdot = jnp.einsum("ck,cn->kn", tables.basis_values, rgb, precision=_HI)
        lams = hero_lams(lam0, cfg.n_wavelengths, cfg.lambda_step)
        x = (lams - tables.basis_low) * tables.basis_inv_step
        w = hat_weights(x, basisdot.shape[0])  # [K, S, N]
        return jnp.sum(basisdot[:, None, :] * w, axis=0)
    if cfg.mode == MODE_MENG:
        from simple_spectral_tpu.spectra.upsample_meng import lrgb_to_specrefl_meng_soa

        return lrgb_to_specrefl_meng_soa(tables, cfg, r, g, b, lam0)
    if cfg.mode == MODE_JAKOB:
        from simple_spectral_tpu.spectra.upsample_jakob import lrgb_to_specrefl_jakob_soa

        return lrgb_to_specrefl_jakob_soa(tables, cfg, r, g, b, lam0)
    raise ValueError(f"no spectral upsampling in mode {cfg.mode!r}")


def evaluate_albedo_cached(
    scene: SceneData, tables, cfg: RenderConfig, cache, mat, oh, st_s, st_t, lam0
):
    """Albedo sample: constant spectrum / constant RGB / on-the-fly spectral
    upsample of an sRGB texel (the paper's headline trick; reference
    src/material.cpp:45-64).  -> f32[S, N]."""
    m = scene.materials
    if cfg.spectral:
        const = jnp.einsum("msn,mn->sn", cache["albedo"], oh, precision=_HI)
    else:
        const = jnp.einsum("mc,mn->cn", m.albedo_rgb, oh, precision=_HI)
    if scene.texture is None:
        return const
    r, g, b = sample_texture_lrgb(scene, st_s, st_t)
    if cfg.spectral:
        texv = lrgb_to_specrefl_soa(
            tables, cfg, r, g, b, lam0, basis_hero=cache.get("basis_hero")
        )
    else:
        texv = jnp.stack([r, g, b])
    is_tex = (select_column(m.albedo_kind.astype(jnp.float32), mat, m.n_materials) > 0.5)
    return jnp.where(is_tex[None, :], texv, const)


def is_mirror_mask(scene, mat):
    bt = select_column(
        scene.materials.bsdf_type.astype(jnp.float32), mat, scene.materials.n_materials
    )
    return bt == float(BSDF_MIRROR)


def is_textured_mask(scene, mat):
    """True for lanes whose hit material's albedo is the texture (reference
    tagged union MaterialSimpleAlbedoBase, src/material.hpp:117-150)."""
    kind = select_column(
        scene.materials.albedo_kind.astype(jnp.float32), mat, scene.materials.n_materials
    )
    return kind > 0.5


def sample_bsdf_direction(key, cfg, is_mirror, w_o: V3, normal: V3):
    """Sample only the BSDF *direction*: cosine-hemisphere for Lambertian
    (reference src/material.cpp:130-143), reflection with a delta pdf for
    mirrors (src/material.cpp:154-167).  The albedo value never enters
    direction sampling -- which is what lets the integrator defer all albedo
    evaluation (and its gathers) to the shading phase.

    Returns (w_i V3[N], pdf f32[N], is_delta bool[N]).  The delta pdf is
    returned as +inf, exactly as the reference's sentinel (the integrator
    converts it to the n.l := 1, pdf := 1 convention, reference
    src/renderer.cpp:234-243).
    """
    from simple_spectral_tpu.render.sampling import rand_coshemi, reflect, rotated_to
    from simple_spectral_tpu.render.vec import where as v3where

    local, pdf_lam = rand_coshemi(key, is_mirror.shape, cfg.eps)
    w_i_lam = rotated_to(local, normal)
    w_i_mir = reflect(w_o, normal)

    w_i = v3where(is_mirror, w_i_mir, w_i_lam)
    pdf = jnp.where(is_mirror, jnp.inf, pdf_lam)
    return w_i, pdf, is_mirror


def evaluate_bsdf_from_albedo(albedo, is_mirror):
    """BSDF value for a given (implicit) w_i from NEE.  Mirrors are Dirac
    deltas: impossible to hit, value 0 (reference src/material.cpp:146-152).
    -> f32[S, N]."""
    return jnp.where(is_mirror[None, :], 0.0, albedo * (1.0 / PI))


def interact_bsdf_from_albedo(key, cfg, albedo, is_mirror, w_o: V3, normal: V3):
    """Sample the BSDF: cosine-hemisphere for Lambertian (reference
    src/material.cpp:130-143), reflection with a delta pdf for mirrors
    (src/material.cpp:154-167).

    The albedo is evaluated once per bounce by the caller and shared with
    the NEE BSDF evaluation (the reference evaluates it twice,
    src/renderer.cpp:198-229 -- pure redundancy).

    Returns (w_i V3[N], pdf f32[N], f_s f32[S,N], is_delta bool[N]).
    The delta pdf is returned as +inf, exactly as the reference's sentinel
    (the integrator converts it to the n.l := 1, pdf := 1 convention,
    reference src/renderer.cpp:234-243).
    """
    from simple_spectral_tpu.render.sampling import rand_coshemi, reflect, rotated_to
    from simple_spectral_tpu.render.vec import where as v3where

    local, pdf_lam = rand_coshemi(key, is_mirror.shape, cfg.eps)
    w_i_lam = rotated_to(local, normal)
    w_i_mir = reflect(w_o, normal)

    w_i = v3where(is_mirror, w_i_mir, w_i_lam)
    pdf = jnp.where(is_mirror, jnp.inf, pdf_lam)
    f_s = jnp.where(is_mirror[None, :], albedo, albedo * (1.0 / PI))
    return w_i, pdf, f_s, is_mirror
