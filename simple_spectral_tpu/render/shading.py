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

import math

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import (
    MODE_JAKOB,
    MODE_MALLETT,
    MODE_MENG,
    RenderConfig,
)
from simple_spectral_tpu.render.vec import V3
from simple_spectral_tpu.scene.types import BSDF_MIRROR, SceneData
from simple_spectral_tpu.spectra.colorimetry import ColorTables

PI = 3.14159265358979323846
_HI = jax.lax.Precision.HIGHEST  # color math must not drop to bf16

# Material-row selection switches from the O(M) masked sum (profiled winner
# at reference scene scale, M ~ 7) to a one-hot contraction above this many
# materials (render/integrator.py _mat_rows; advisor round-3 item 2).
MAT_ROWS_CONTRACTION_THRESHOLD = 12


def material_onehot(n_materials: int, mat):
    """i32[N] -> f32[M, N] one-hot."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_materials, 1), 0)
    return (iota == mat[None, :]).astype(jnp.float32)


def select_column(column, mat, n_materials: int):
    """f32[M] or i32[M] at i32[N] -> [N], as a one-hot contraction: dense
    vector math instead of a gather (slow inside fat fusions, see
    integrator docstring) or an M-step where-chain (O(M) sequential selects
    that scale hostile past M~10, round-2 VERDICT item 10).  Exactly one
    one-hot term is nonzero, so f32 accumulation is exact."""
    oh = material_onehot(n_materials, mat)  # f32[M, N]
    vals = column.astype(jnp.float32)
    out = jnp.einsum("m,mn->n", vals, oh, precision=_HI)
    return out.astype(column.dtype)


from simple_spectral_tpu.spectra.spectrum import hat_weights, hero_lams_soa as hero_lams


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
        # per-material grids: values f32[M, K]; low/inv_step f32[M]
        # -> f32[M, S, N].  K-dense VPU pass (each material has its own
        # fractional coordinate, so the hat weights carry an M axis).
        x = (lams[None, :, :] - low[:, None, None]) * inv_step[:, None, None]
        k_dim = values.shape[1]
        w = hat_weights(x, k_dim)  # [K, M, S, N]
        return jnp.sum(values.T[:, :, None, None] * w, axis=0)

    def sample_all_common(values, resample, grid):
        # shared lattice (scene/library.py _common_grid_resample): resample
        # each material onto the common grid (tiny matmul, exact), then ONE
        # shared hat-weight tensor + an [M, Kc] x [Kc, S*N] MXU contraction.
        g_low, g_step, kc = grid
        res = jnp.einsum("mk,mjk->mj", values, resample, precision=_HI)

        # Hero wavelengths are lam0 + s*LAMBDA_STEP; when LAMBDA_STEP is an
        # integer multiple R of the lattice pitch (true for every shipped
        # scene/observer), hat(xg[s] - j) == hat(x0 - (j - s*R)): the S hat
        # tensors are SHIFTED copies of one small window, so the contraction
        # collapses to [M*S, K0] x [K0, N] with K0 = R+3 instead of
        # [M, Kc] x [Kc, S*N] -- ~4x fewer MACs, K0-sized weights, and
        # 4x denser MXU rows (measured: the general form is ~18 ms of the
        # canonical fwd+bwd, tools/bwd_bisect_r03.json).
        s_dim = cfg.n_wavelengths
        r_ratio = cfg.lambda_step / g_step
        r_int = int(round(r_ratio))
        if abs(r_ratio - r_int) < 1e-9 and s_dim > 1:
            x0 = (lam0[None, :] - g_low) * (1.0 / g_step)  # [1, N]
            j0 = math.floor((cfg.lambda_min - g_low) / g_step) - 1
            k0 = r_int + 3
            # window must stay inside the lattice for every shift
            if j0 >= 0 and j0 + k0 + (s_dim - 1) * r_int <= kc:
                w0 = hat_weights(x0 - j0, k0)[:, 0, :]  # [K0, N]
                res2 = jnp.stack(
                    [res[:, j0 + s * r_int: j0 + s * r_int + k0]
                     for s in range(s_dim)],
                    axis=1,
                )  # [M, S, K0]
                return jnp.einsum("msk,kn->msn", res2, w0, precision=_HI)

        xg = (lams - g_low) * (1.0 / g_step)  # [S, N]
        wg = hat_weights(xg, kc)  # [Kc, S, N], M-free
        return jnp.einsum("mj,jsn->msn", res, wg, precision=_HI)

    if m.albedo_grid is not None:
        albedo = sample_all_common(m.albedo_values, m.albedo_resample, m.albedo_grid)
    else:
        albedo = sample_all(m.albedo_values, m.albedo_low, m.albedo_inv_step)
    if m.emission_grid is not None:
        emission = sample_all_common(m.emission_values, m.emission_resample, m.emission_grid)
    else:
        emission = sample_all(m.emission_values, m.emission_low, m.emission_inv_step)
    return {"albedo": albedo, "emission": emission}


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


def texel_index(scene: SceneData, st_s, st_t):
    """Clamped nearest-neighbor ST -> flat texel index with vertical flip
    (reference src/material.cpp:66-97), as pure int math for the geometry
    phase -- the actual fetch is deferred to the shading phase."""
    w, h = scene.tex_res
    i = jnp.clip(jnp.floor(st_s * w).astype(jnp.int32), 0, w - 1)
    j = jnp.clip(jnp.floor(h - st_t * h).astype(jnp.int32), 0, h - 1)
    return j * w + i


def texel_fetch_lrgb(scene: SceneData, tex_idx, texel_words=None):
    """Fetch packed sRGB texels at precomputed flat indices -> linear RGB
    (r, g, b) f32[N] (reference src/material.cpp:45-64 pipeline: sRGB u8 ->
    f32 -> srgb_to_lrgb).

    Layout choice is measured (tools/bench_gather_micro.py, v5e): TPU random
    gathers cost ~7 ns per *index* regardless of fusion context (an
    optimization_barrier changes nothing), and scale with row width (f32[T,3]
    rows cost ~1.5x a u32[T] gather), while the pow-gamma decode is fully
    hidden behind the gather.  So the texture ships as ONE packed u32 per
    texel (scene.types packs 0xRRGGBB) -- one narrow gather -- and the exact
    sRGB decode stays on device for free.

    ``texel_words``: optional pre-fetched packed words u32[N] (merged-fetch
    path, see trace_lanes) -- skips the per-bounce take."""
    from simple_spectral_tpu.spectra.colorimetry import srgb_to_lrgb

    packed = texel_words if texel_words is not None else jnp.take(
        scene.texture, tex_idx, axis=0)
    scale = 1.0 / 255.0
    r = ((packed >> 16) & 0xFF).astype(jnp.float32) * scale
    g = ((packed >> 8) & 0xFF).astype(jnp.float32) * scale
    b = (packed & 0xFF).astype(jnp.float32) * scale
    return srgb_to_lrgb(r), srgb_to_lrgb(g), srgb_to_lrgb(b)


def texture_albedo_deferred(scene: SceneData, tables, cfg: RenderConfig, cache, tex_idx, lam0,
                            texel_rows=None):
    """Per-bounce textured-albedo evaluation for the shading phase: one texel
    gather + dense math, per color pipeline.

    - rgb:      packed-u32 gather -> lRGB                      -> f32[3, N]
    - mallett:  packed-u32 gather, refl = r R + g G + b B with the basis
                pre-sampled at the hero wavelengths (linear in lRGB, exact)
    - jakob:    f32[T,3] row gather of precomputed sigmoid coefficients
                (cube fetch hoisted to scene build), 3 FMA + rsqrt per (s,n)
    - meng:     f32[T,12] row gather of precomputed (point ids, weights);
                spectra contraction over grid points on the MXU, then a hat
                contraction to the per-lane hero wavelengths
    All per-hit table walks are hoisted to scene build (the texture is
    static; reference src/util/color.cpp:166-235 and src/material.cpp:45-64
    redo them per hit) -- only one texel gather and the hero-wavelength
    evaluation remain on the hot path, and the gather's ~7 ns/index
    (tools/bench_gather_micro.py) is the floor for this op on TPU.

    ``texel_rows``: optional pre-fetched texel rows f32[N, C] for the
    jakob/meng row modes -- the integrator merges all bounces' fetches into
    one gather (see trace_lanes; tools/ctx_gather_r04.json) and passes each
    bounce's slice here, skipping the per-bounce take.
    """
    if not cfg.spectral:
        r, g, b = texel_fetch_lrgb(scene, tex_idx, texel_words=texel_rows)
        return jnp.stack([r, g, b])
    if cfg.mode == MODE_MALLETT:
        r, g, b = texel_fetch_lrgb(scene, tex_idx, texel_words=texel_rows)
        bh = cache["basis_hero"]  # [3, S, N]
        return bh[0] * r[None, :] + bh[1] * g[None, :] + bh[2] * b[None, :]
    if cfg.mode == MODE_JAKOB:
        if cfg.texel_format == "u32":
            # q32: one u32 word per texel; dequant (3 sinh FMAs) + the
            # sigmoid eval are fused VPU work hidden behind the 1-D gather
            # (spectra/upsample_jakob.py q32 notes; measured fidelity
            # tools/texel_q32_check.py).
            from simple_spectral_tpu.spectra.upsample_jakob import (
                jakob_q32_eval_soa,
            )

            words = texel_rows if texel_rows is not None else jnp.take(
                scene.texture, tex_idx, axis=0)  # u32[N]
            return jakob_q32_eval_soa(
                words, scene.texel_meta, lam0,
                cfg.n_wavelengths, cfg.lambda_step,
            )
        # 1-D per-wavelength evaluation (round 4): the [S, N] form of the
        # sigmoid-polynomial eval got the T(1, 128) sublane-starved layout
        # (the same pathology the integrator's shading chain hit in round 3)
        # and dominated the jakob config's 47-of-56 ms texture branch
        # (tools/modes_r04.json).  S is 4 and static; unroll it.
        rows = texel_rows if texel_rows is not None else jnp.take(
            scene.texture, tex_idx, axis=0)  # [N, 3]
        c0, c1, c2 = rows[:, 0], rows[:, 1], rows[:, 2]
        outs = []
        for s in range(cfg.n_wavelengths):
            lam = lam0 + (s * cfg.lambda_step)  # f32[N]
            x = (c0 * lam + c1) * lam + c2
            outs.append(0.5 * x * jax.lax.rsqrt(x * x + 1.0) + 0.5)
        return jnp.stack(outs)
    if cfg.mode == MODE_MENG:
        if cfg.texel_format == "u32":
            # One packed sRGB word per texel; the whole chromaticity-grid
            # walk (reference spectrum_grid.h:13-137) runs HERE, gather-free:
            # cell tables via one one-hot contraction over the 168 cells
            # (spectra/upsample_meng.py onehot variant).  Same arithmetic as
            # the build-time walk that fills the "rows" format.
            from simple_spectral_tpu.spectra.upsample_meng import (
                lrgb_to_xyz_meng,
                meng_cell_weights_soa_onehot,
            )

            r, g, b = texel_fetch_lrgb(scene, tex_idx, texel_words=texel_rows)
            mx, my, mz = lrgb_to_xyz_meng(r, g, b)
            pidx_arr, w_arr = meng_cell_weights_soa_onehot(
                tables.meng, mx, my, mz)  # [6, N] each
            pidx_slots = [pidx_arr[s] for s in range(6)]
            w_slots = [w_arr[s] for s in range(6)]
        else:
            rows = texel_rows if texel_rows is not None else jnp.take(
                scene.texture, tex_idx, axis=0)  # [N, 12]
            pidx_slots = [rows[:, s].astype(jnp.int32) for s in range(6)]
            w_slots = [rows[:, 6 + s] for s in range(6)]
        meng = tables.meng
        spec = meng["pts_spectrum"]  # [P, K]
        n_pts = spec.shape[0]
        n = tex_idx.shape[0]
        # omega[p, n] = sum_slot w[slot][n] * [pidx[slot][n] == p]
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (n_pts, 1), 0)
        omega = jnp.zeros((n_pts, n), jnp.float32)
        for slot in range(6):
            omega = omega + jnp.where(
                iota_p == pidx_slots[slot][None, :], w_slots[slot][None, :], 0.0
            )
        # q[k, n] = sum_p spec[p, k] * omega[p, n]  (MXU)
        q = jnp.einsum("pk,pn->kn", spec, omega, precision=_HI)
        # Hero-wavelength reconstruction: linear interp over the K 5-nm bins
        # clamped to the table edges (the CIE-2006 extension; see
        # spectra/upsample_meng.py module docstring).  Round 4: LAMBDA_STEP
        # is an integer number R of bins for both observers (100/5, 110/5),
        # so hat(x_s - j) = hat(x_0 - (j - s R)): ONE small [W, N] weight
        # window shared by all S wavelengths against S static row slices of
        # q, instead of a materialized [K, S, N] hat tensor (81 x 4 x 2^18
        # f32 = 340 MB per bounce -- the meng config's dominant cost,
        # tools/modes_r04.json).  Edge clamp is reproduced by padding q with
        # replicated last rows: interpolating between equal values IS the
        # clamp.
        from simple_spectral_tpu.spectra.upsample_meng import meng_grid_meta

        # static window geometry from trace-time dataset constants (the
        # traced meng dict's floats cannot drive Python control flow)
        g_lam_min, g_lam_max, k_meta = meng_grid_meta()
        k_dim = spec.shape[1]
        assert k_dim == k_meta, "meng tables / metadata mismatch"
        bin_w = (g_lam_max - g_lam_min) / (k_dim - 1)
        r_ratio = cfg.lambda_step / bin_w
        r_int = int(round(r_ratio))
        s_dim = cfg.n_wavelengths
        j0 = math.floor((cfg.lambda_min - g_lam_min) / bin_w)
        if abs(r_ratio - r_int) < 1e-9 and j0 >= 0:
            w_width = r_int + 2
            k_need = j0 + w_width + (s_dim - 1) * r_int
            if k_need > k_dim:
                q = jnp.concatenate(
                    [q, jnp.broadcast_to(q[-1:], (k_need - k_dim, n))], axis=0
                )
            xw = (lam0 - g_lam_min) * (1.0 / bin_w) - j0  # f32[N], in [0, W-1)
            wins = [jnp.maximum(0.0, 1.0 - jnp.abs(xw - j)) for j in range(w_width)]
            outs = []
            for s in range(s_dim):
                base = j0 + s * r_int
                acc = q[base] * wins[0]
                for j in range(1, w_width):
                    acc = acc + q[base + j] * wins[j]
                outs.append(acc)
            return jnp.stack(outs)
        # fallback (non-integer bin ratio): dense hat contraction
        lams = hero_lams(lam0, cfg.n_wavelengths, cfg.lambda_step)
        x = (lams - meng["lam_min"]) / (meng["lam_max"] - meng["lam_min"]) * (k_dim - 1)
        x = jnp.clip(x, 0.0, k_dim - 1)
        wk = hat_weights(x, k_dim)  # [K, S, N]
        return jnp.sum(q[:, None, :] * wk, axis=0)
    raise ValueError(f"unsupported mode {cfg.mode!r}")


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
