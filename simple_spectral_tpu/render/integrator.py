"""Wavefront path-tracing integrator (SoA layout, deferred shading).

The reference's recursive per-ray lambda ``L`` (reference
src/renderer.cpp:147-255) is inverted into a flat array-of-lanes program: one
lane = one (pixel, sample) pair -- positions as V3 tuples of ``f32[N]``,
spectra as ``f32[S, N]`` (see render/vec.py for the layout rule).

The integrator runs in TWO PHASES -- the TPU-native analog of wavefront path
tracing with deferred shading:

1. **Geometry phase** (``lax.scan`` over bounce depth): intersect, NEE light
   sampling + shadow intersect, BSDF *direction* sampling.  Path geometry
   never reads a material's albedo VALUE (Lambertian cosine sampling and
   mirror reflection depend only on the material's type), so this loop
   contains no texture access at all.  It records per bounce: material id,
   texel index, NEE weight, shadow-hit material, BSDF weight, gates.

2. **Shading phase** (straight-line, unrolled over depth): evaluates every
   bounce's albedo -- constant spectra via one-hot contraction, textured
   materials via texel gather + on-the-fly spectral upsampling -- then
   reconstructs throughput as a cumulative product and accumulates emission
   + NEE radiance.

Why the split matters on TPU: a gather op placed next to the fat ``[T, N]``
intersection fusions executes ~3 orders of magnitude slower than the same
gather in thin straight-line context (measured on v5e: 2.5 ms vs ~7 us for
262144 lanes).  Deferring shading moves all gathers (texture texels, Meng
grid cells, Jakob-Hanika coefficient cube) out of the loop into phase 2,
where they issue as independent fast gathers.

Differentiable: radiance is linear in the material emission tables and
polynomial in the albedo tables; the discrete hit structure (which triangle,
which direction) does not depend on those leaves, so reverse-mode AD through
phase 2 yields the correct light-transport gradients while phase 1 is
constant w.r.t. the parameters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.intersect import intersect_rays_dispatch
from simple_spectral_tpu.render.sampling import (
    rand_toward_spherical_triangle,
    spherical_triangle,
    uniform,
)
from simple_spectral_tpu.render.shading import (
    PI,
    is_mirror_mask,
    is_textured_mask,
    material_onehot,
    MAT_ROWS_CONTRACTION_THRESHOLD,
    precompute_basis_hero,
    precompute_constant_spectra,
    sample_bsdf_direction,
    select_column,
    texel_index,
    texture_albedo_deferred,
)
from simple_spectral_tpu.render.vec import V3, dot, normalize, splat
from simple_spectral_tpu.render.vec import where as v3where
from simple_spectral_tpu.scene.types import SceneData
from simple_spectral_tpu.spectra.colorimetry import (
    ColorTables,
    specradflux_to_ciexyz_hero_soa,
)


def camera_rays_soa(scene: SceneData, cfg: RenderConfig, key, px_i, px_j):
    """Primary rays through jittered subpixel positions.

    The reference unprojects NDC through (PV)^-1 in f64 on every sample
    (reference src/renderer.cpp:113-132); we instead evaluate the
    host-precomputed affine factorization dir ~ axis_o + x axis_x + y axis_y
    (see scene.types.make_camera), which is f32-stable.
    """
    cam = scene.camera
    n = px_i.shape[0]
    ka, kb = jax.random.split(key)
    sub_x = uniform(ka, (n,))
    sub_y = uniform(kb, (n,))
    ndc_x = (px_i.astype(jnp.float32) + sub_x) * (2.0 / cfg.width) - 1.0
    ndc_y = (px_j.astype(jnp.float32) + sub_y) * (2.0 / cfg.height) - 1.0
    d = normalize(
        V3(
            cam.axis_o[0] + ndc_x * cam.axis_x[0] + ndc_y * cam.axis_y[0],
            cam.axis_o[1] + ndc_x * cam.axis_x[1] + ndc_y * cam.axis_y[1],
            cam.axis_o[2] + ndc_x * cam.axis_x[2] + ndc_y * cam.axis_y[2],
        )
    )
    o = splat(cam.pos, ndc_x)
    return o, d


def _sample_light_dir(key, scene: SceneData, from_pos: V3):
    """Uniform-over-lights NEE direction sample (reference
    src/scene.cpp:417-431 + src/geometry.cpp:103-116,141-145).

    Returns (dir V3[N], inv_pdf f32[N], light_prim i32[N]).  The inverse
    pdf (= solid_angle * 2 * n_lights for quads; cap_area * n_lights for
    sphere lights) is returned instead of the pdf so the degenerate-
    triangle case (solid angle 0) contributes exactly 0 without NaN (the
    reference reaches the same value via pdf = inf).

    Sphere lights (scene.n_sphere_lights > 0, a static flag so quad-only
    scenes compile the exact round-4 program): sampled with the cone-cap
    recipe (reference src/util/random.cpp:51-99; render/sampling.py
    rand_toward_sphere), selected branchlessly against the quad path."""
    n = from_pos.x.shape[0]
    k_choice, k_tri, k_arvo = jax.random.split(key, 3)
    n_lights = scene.n_lights
    light_idx = jax.random.randint(k_choice, (n,), 0, n_lights)
    light_prim = select_column(scene.light_prims, light_idx, n_lights)
    # 50/50 triangle choice within the quad (reference src/geometry.cpp:141-145)
    pick = (uniform(k_tri, (n,)) > 0.5).astype(jnp.int32)
    flat_choice = light_idx * 2 + pick  # index into light_tris.reshape(-1)
    # light triangle vertices, gathered once (tiny: [2L, 3, 3]); per-lane
    # selection as ONE one-hot contraction over the 2L light triangles --
    # dense VPU/MXU math instead of a 2L-step where-chain (9 selects per
    # step), so cost stays one fused contraction as L grows (round-2
    # VERDICT item 10).  Exactly one term is nonzero per lane: exact in f32.
    lt_verts = scene.tri_verts[scene.light_tris.reshape(-1)]
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (2 * n_lights, 1), 0)
    oh_l = (iota_l == flat_choice[None, :]).astype(jnp.float32)  # [2L, N]
    verts = jnp.einsum("lva,ln->van", lt_verts, oh_l,
                       precision=jax.lax.Precision.HIGHEST)  # [3, 3, N]

    def vert(v):
        return V3(verts[v, 0], verts[v, 1], verts[v, 2])

    a = normalize(vert(0) - from_pos)
    b = normalize(vert(1) - from_pos)
    c = normalize(vert(2) - from_pos)
    tri = spherical_triangle(a, b, c)
    d = rand_toward_spherical_triangle(k_arvo, tri)
    inv_pdf = tri.area * (2.0 * n_lights)
    if scene.n_sphere_lights:
        from simple_spectral_tpu.render.sampling import rand_toward_sphere

        # per-lane sphere params: one-hot contraction over the L lights
        # (kind rows are 0 for quads; exactly one nonzero term -> exact)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (n_lights, 1), 0)
              == light_idx[None, :]).astype(jnp.float32)  # [L, N]
        sph = jnp.einsum("lc,ln->cn", scene.light_sph, oh,
                         precision=jax.lax.Precision.HIGHEST)  # [4, N]
        is_sph = select_column(
            scene.light_kind.astype(jnp.float32), light_idx, n_lights) > 0.5
        to_c = V3(sph[0] - from_pos.x, sph[1] - from_pos.y,
                  sph[2] - from_pos.z)
        d_sph, cap_area = rand_toward_sphere(k_tri, to_c, sph[3])
        d = v3where(is_sph, d_sph, d)
        inv_pdf = jnp.where(is_sph, cap_area * n_lights, inv_pdf)
    return d, inv_pdf, light_prim


class LaneResult(NamedTuple):
    value: jnp.ndarray  # f32[N, 3]: XYZ (spectral) or lRGB flux estimate
    alpha: jnp.ndarray  # f32[N]: 1 where the camera ray hit anything


class BounceRecord(NamedTuple):
    """Per-bounce geometry-phase outputs consumed by the shading phase.
    All leaves are [N] per bounce, stacked to [D-1, N] by the scan."""

    mat: jnp.ndarray  # i32: hit material id (0 where miss)
    tex_idx: jnp.ndarray  # i32: flat texel index (0 when scene untextured)
    emit_w: jnp.ndarray  # f32: 1 where this bounce's emission counts
    nee_w: jnp.ndarray  # f32: n.l / pdf_light, 0 where NEE is gated off
    shad_mat: jnp.ndarray  # i32: material hit by the shadow ray
    bsdf_w: jnp.ndarray  # f32: n.l / pdf_bsdf (delta: 1), 0 where path died


def trace_lanes(
    scene: SceneData,
    tables: ColorTables,
    cfg: RenderConfig,
    key,
    px_i,
    px_j,
) -> LaneResult:
    """Trace one sample for each lane; px_i/px_j: i32[N] pixel coordinates.

    Equivalent of ``Renderer::_render_sample`` (reference
    src/renderer.cpp:104-276) over a flat batch.
    """
    n = px_i.shape[0]
    s_dim = cfg.n_wavelengths if cfg.spectral else 3
    k_cam, k_lam, k_scan = jax.random.split(key, 3)

    ray_o, ray_d = camera_rays_soa(scene, cfg, k_cam, px_i, px_j)
    cam_dir0 = ray_d  # kept for flat-field correction

    if cfg.spectral:
        lam0 = cfg.lambda_min + uniform(k_lam, (n,)) * cfg.lambda_step
    else:
        lam0 = jnp.zeros((n,), jnp.float32)

    # material spectra depend only on lam0: evaluated once, reused per bounce.
    # jax.checkpoint (cfg.remat_cache): the hat-weight tensors ([K, M, S, N])
    # linking the material tables to per-lane hero samples would otherwise be
    # saved as AD residuals -- 12 GB of HBM per 4-spp chunk at 2^18 lanes;
    # recomputing them in the backward sweep is a few VPU ops per element.
    precompute = lambda s, l: precompute_constant_spectra(s, cfg, l)
    if cfg.remat_cache:
        precompute = jax.checkpoint(precompute, static_argnums=())
    cache = precompute(scene, lam0)
    if cfg.spectral and cfg.mode == "mallett" and scene.texture is not None:
        # texture upsample basis, also lam0-only (see precompute_basis_hero)
        cache["basis_hero"] = precompute_basis_hero(tables, cfg, lam0)

    has_tex = scene.texture is not None
    zeros_i = jnp.zeros((n,), jnp.int32)

    def emission_gate(live_hit, depth):
        # reference src/renderer.cpp:167-175; with ELS, last_was_delta is
        # true only for the camera ray
        gate = live_hit & (depth == 0) if cfg.els else live_hit
        if cfg.indirect_only:
            gate = gate & (depth > 0)
        return gate

    # ------------------------------------------------------------------ #
    # Phase 1: geometry.  No albedo values, no gathers.                   #
    # ------------------------------------------------------------------ #
    def body(carry, depth):
        """One bounce's geometry: intersect, NEE visibility, direction
        sample.  Runs for depth = 0 .. max_depth-2; the final depth adds
        emission only (reference gates NEE/bounce on depth+1 < MAX_DEPTH,
        src/renderer.cpp:178)."""
        (o, d, ignore, alive, camera_hit) = carry
        kd = jax.random.fold_in(k_scan, depth)
        k_nee, k_bsdf = jax.random.split(kd)

        rec = intersect_rays_dispatch(scene, o, d, ignore, cfg.eps, impl=cfg.intersect_impl)
        live_hit = alive & rec.hit
        camera_hit = camera_hit | (live_hit & (depth == 0))
        emit_w = emission_gate(live_hit, depth).astype(jnp.float32)

        hit_dist = jnp.where(jnp.isfinite(rec.dist), rec.dist, 0.0)
        hit_pos = o + hit_dist * d
        is_mirror = is_mirror_mask(scene, rec.mat)
        tex_idx = texel_index(scene, rec.st_s, rec.st_t) if has_tex else zeros_i

        # Next-event estimation geometry (src/renderer.cpp:182-220)
        if cfg.els:
            shad_d, inv_pdf, light_prim = _sample_light_dir(k_nee, scene, hit_pos)
            n_dot_l = dot(shad_d, rec.normal)
            nee_gate = live_hit & (n_dot_l > 0.0)
            if cfg.indirect_only:
                nee_gate = nee_gate & (depth > 0)
            shad_rec = intersect_rays_dispatch(
                scene, hit_pos, shad_d, rec.prim, cfg.eps,
                need_attrs=False, impl=cfg.intersect_impl,
            )
            nee_gate = nee_gate & (shad_rec.prim == light_prim)
            nee_w = jnp.where(nee_gate, n_dot_l * inv_pdf, 0.0)
            shad_mat = shad_rec.mat
        else:
            nee_w = jnp.zeros((n,), jnp.float32)
            shad_mat = zeros_i

        # BSDF direction sample (src/renderer.cpp:222-250).  The albedo
        # VALUE never enters: only the material type picks the sampler.
        # (The reference also kills paths whose f_s is identically zero,
        # src/renderer.cpp:244-249 -- a CPU work-saving cutoff; in a masked
        # wavefront dead lanes cost the same, and the zero throughput factor
        # zeroes every later contribution, so results are identical.)
        w_i, pdf, is_delta = sample_bsdf_direction(k_bsdf, cfg, is_mirror, -d, rec.normal)
        n_dot_l_b = dot(w_i, rec.normal)
        # delta convention: n.l := 1, pdf := 1 (src/renderer.cpp:234-243)
        n_dot_l_b = jnp.where(is_delta, 1.0, n_dot_l_b)
        pdf = jnp.where(is_delta, 1.0, pdf)
        cont = live_hit & (n_dot_l_b > 0.0)
        bsdf_w = jnp.where(cont, n_dot_l_b / jnp.where(pdf > 0.0, pdf, 1.0), 0.0)

        o = v3where(cont, hit_pos, o)
        d = v3where(cont, w_i, d)
        ignore = jnp.where(cont, rec.prim, ignore)
        alive = cont
        ys = BounceRecord(
            mat=rec.mat, tex_idx=tex_idx, emit_w=emit_w,
            nee_w=nee_w, shad_mat=shad_mat, bsdf_w=bsdf_w,
        )
        return (o, d, ignore, alive, camera_hit), ys

    init = (
        ray_o,
        ray_d,
        jnp.full((n,), -1, jnp.int32),
        jnp.ones((n,), bool),
        jnp.zeros((n,), bool),
    )
    n_bounces = cfg.max_depth - 1
    if n_bounces > 0:
        if cfg.unroll_geometry:
            # UNROLLED depth loop (default; round-4 measured decision): a
            # lax.scan stacks its per-bounce outputs into [D-1, N] buffers
            # whose [1, N] row slices XLA lays out T(1, 128) and then
            # relayouts for every consumer -- the xplane profile of the
            # textured configs showed ~13.7 ms of async copy per bounce
            # feeding each texel gather (s32[1, N]{T(1,128)S(1)} copy-start
            # ops; see tools/ctx_gather_r04.json analysis).  Unrolling keeps
            # every per-bounce record a plain [N] array in the packed
            # T(1024) layout.  Depth is static and small (9 at the
            # reference MAX_DEPTH), so the graph growth is bounded.
            carry = init
            rec_list = []
            for depth in range(n_bounces):
                carry, ys = body(carry, jnp.int32(depth))
                rec_list.append(ys)
            carry = jax.lax.stop_gradient(carry)
            rec_list = jax.lax.stop_gradient(rec_list)
            recs = BounceRecord(*(list(f) for f in zip(*rec_list)))
        else:
            carry, recs_stacked = jax.lax.scan(
                body, init, jnp.arange(n_bounces, dtype=jnp.int32)
            )
            # The geometry phase is constant w.r.t. the differentiable
            # material tables (hit structure, NEE weights and BSDF pdfs
            # depend on geometry + RNG only -- see module docstring);
            # stop_gradient makes that explicit so the AD partial-eval can
            # never drag the [T, N] intersect sweeps or their residuals
            # into the backward pass.  Verified exactly: per-entry central-
            # difference gradient tests (tests/test_gradients.py) cover all
            # four modes.
            carry = jax.lax.stop_gradient(carry)
            recs_stacked = jax.lax.stop_gradient(recs_stacked)
            recs = BounceRecord(
                *([f[k] for k in range(n_bounces)] for f in recs_stacked)
            )
    else:
        carry, recs = init, None
    # final depth: emission only (no NEE, no bounce, no attribute pickup).
    # With ELS on, emission_gate(live, depth) is live & (depth == 0), which
    # is STATICALLY zero at the final depth whenever max_depth > 1 -- the
    # whole final intersect (1 of the 19 sweeps) provably contributes
    # nothing, so skip it.  The reference pays it (src/renderer.cpp:167-175
    # evaluates emission and multiplies by the gate); dropping a term whose
    # gate is identically zero is bitwise-free.
    (o, d, ignore, alive, camera_hit) = carry
    final_dead = cfg.els and cfg.max_depth > 1
    if final_dead:
        final_emit_w = final_mat = None  # final term statically dropped
    else:
        rec = intersect_rays_dispatch(
            scene, o, d, ignore, cfg.eps, need_attrs=False, impl=cfg.intersect_impl
        )
        live_hit = alive & rec.hit
        camera_hit = camera_hit | (live_hit & (cfg.max_depth == 1))
        last_depth = jnp.int32(cfg.max_depth - 1)
        final_emit_w = emission_gate(live_hit, last_depth).astype(jnp.float32)
        final_mat = rec.mat

    # ------------------------------------------------------------------ #
    # Phase 2: shading.  Straight-line; material selection per bounce is an
    # unrolled masked SUM over the M material rows, fused by XLA into the
    # consuming radiance/throughput updates.  PROFILED choice
    # (tools/profile_fwd.py, v5e): the previous batched one-hot einsum
    # ("msn,mdn->dsn") was rewritten by XLA into three [N, D, S] row
    # gathers plus layout copies -- ~9.7 ms of the 42 ms forward call --
    # while the M-term masked sum (M = 7 scene materials) is pure fused
    # VPU selects with no materialized [D, S, N] intermediates.  Gradient
    # semantics are identical: every material row keeps a live, masked
    # gradient path (tests/test_gradients.py checks non-hit entries too).
    # Past M ~ a few dozen a contraction would win again; revisit with BVH
    # -scale scenes.
    # ------------------------------------------------------------------ #
    m = scene.materials

    def _mat_rows(table, mat_k):
        """table f32[M, C, N] (per-lane spectra cache) or f32[M, C] (rgb
        constants); mat_k i32[N] -> f32[C, N] selected rows.

        Two forms, switched on M (advisor round-3 item 2): the masked sum is
        the profiled winner at scene scale (M ~ 7, see block comment above)
        but is O(M) sequential selects; past MAT_ROWS_CONTRACTION_THRESHOLD
        materials (BVH-scale scenes) selection becomes ONE one-hot einsum --
        dense MXU/VPU contraction whose cost is a single fused op regardless
        of M.  Exactly one one-hot term is nonzero per lane, so the f32
        contraction is exact; gradient flow is identical."""
        if m.n_materials > MAT_ROWS_CONTRACTION_THRESHOLD:
            oh = material_onehot(m.n_materials, mat_k)  # f32[M, N]
            if table.ndim == 2:  # rgb constants f32[M, C]
                return jnp.einsum("mc,mn->cn", table, oh,
                                  precision=jax.lax.Precision.HIGHEST)
            return jnp.einsum("mcn,mn->cn", table, oh,
                              precision=jax.lax.Precision.HIGHEST)
        out = None
        for mi in range(m.n_materials):
            row = table[mi]
            if row.ndim == 1:
                row = row[:, None]  # [C, 1] broadcasts over lanes
            term = jnp.where((mat_k == mi)[None, :], row, 0.0)
            out = term if out is None else out + term
        return out

    emit_table = cache["emission"] if cfg.spectral else m.emission_rgb
    alb_table = cache["albedo"] if cfg.spectral else m.albedo_rgb

    def emission_of(mat_k):
        return _mat_rows(emit_table, mat_k)

    # Texel-row fetch for ALL bounces in ONE merged gather for the
    # row-gather modes (jakob [N,3], meng [N,12]): the per-bounce gather
    # fusions each ran ~13.7 ms in context -- 4.7x the isolated cost of the
    # identical gather -- while one merged [B*N]-index gather runs at the
    # isolated per-index rate (tools/ctx_gather_r04.json variants B vs D
    # against the xplane profile of cfg4).  Per-bounce spectral evaluation
    # then consumes its pre-fetched row slice (meng's grid contraction
    # stays per-bounce: batching it over bounces would materialize a
    # [P, B*N] 1.6 GB omega).  The merged fetch covers EVERY textured mode:
    # u32 modes (rgb, mallett, and the quantized jakob/meng texel formats)
    # gather one packed word per (bounce, lane); only f32-row formats fetch
    # multi-word rows.
    merged_rows = None
    if has_tex and n_bounces > 0:
        flat_idx = jnp.concatenate(recs.tex_idx)  # [B*N]
        fetched = jnp.take(scene.texture, flat_idx, axis=0)
        # per-bounce slices: [N, C] rows (jakob/meng) or [N] words (u32)
        merged_rows = [fetched[k * n:(k + 1) * n] for k in range(n_bounces)]

    def albedo_of(k):
        const = _mat_rows(alb_table, recs.mat[k])
        if not has_tex:
            return const
        rows_k = None if merged_rows is None else merged_rows[k]
        texv = texture_albedo_deferred(
            scene, tables, cfg, cache, recs.tex_idx[k], lam0, texel_rows=rows_k
        )
        # The texture is not a differentiable leaf (render/trainstep.py
        # DIFF_FIELDS); making that explicit keeps the texel decode chain
        # (q32 dequant / meng grid walk) out of the AD residual set.
        texv = jax.lax.stop_gradient(texv)
        is_tex = is_textured_mask(scene, recs.mat[k])
        return jnp.where(is_tex[None, :], texv, const)

    # The accumulation chain runs on per-wavelength 1D [N] arrays, not
    # [S, N]: profiling (tools/profile_fwd.py) showed XLA fusing the whole
    # bounce chain into rank-3 [1, S, N] kLoop fusions laid out T(1,128) --
    # the size-1 dim becomes the sublane axis and the VPU runs at 1/8
    # utilization (~2.1 M estimated cycles per fusion).  1D [N] arrays get
    # the dense T(1024) packed layout like every mask in the loop.  S is 4
    # (hero wavelengths) or 3 (rgb), so the unroll is small and static.
    def _unstack(x):
        return [x[s] for s in range(s_dim)]

    beta = [jnp.ones((n,), jnp.float32) for _ in range(s_dim)]
    radiance = [jnp.zeros((n,), jnp.float32) for _ in range(s_dim)]
    for k in range(n_bounces):
        emit = _unstack(emission_of(recs.mat[k]))
        albedo = _unstack(albedo_of(k))
        mirror = is_mirror_mask(scene, recs.mat[k])
        if cfg.els:
            light_emit = _unstack(emission_of(recs.shad_mat[k]))
        for s in range(s_dim):
            radiance[s] = radiance[s] + (beta[s] * recs.emit_w[k]) * emit[s]
            if cfg.els:
                # f_s for the light direction: Lambertian albedo/pi; a
                # mirror's delta BRDF cannot be hit by NEE -> 0
                # (src/material.cpp:146-152)
                f_s_nee = jnp.where(mirror, 0.0, albedo[s] * (1.0 / PI))
                radiance[s] = radiance[s] + beta[s] * f_s_nee * light_emit[s] * recs.nee_w[k]
            # throughput update: f_s = albedo (mirror) | albedo/pi
            # (Lambertian), times n.l/pdf (delta convention already folded
            # into bsdf_w)
            f_fac = jnp.where(mirror, albedo[s], albedo[s] * (1.0 / PI))
            beta[s] = beta[s] * f_fac * recs.bsdf_w[k]
    if not final_dead:
        # with ELS the final emission gate is statically zero (final_dead)
        # and the whole term -- selection included -- is dropped.
        emit = _unstack(emission_of(final_mat))
        for s in range(s_dim):
            radiance[s] = radiance[s] + (beta[s] * final_emit_w) * emit[s]

    # Flat-field correction (reference src/renderer.cpp:262-266): by default
    # the radiance estimate *is* the flux estimate; otherwise weight by the
    # cosine to the camera forward axis.
    if not cfg.flat_field:
        cosw = dot(cam_dir0, splat(scene.camera.forward, cam_dir0.x))
        radiance = [r * cosw for r in radiance]
    flux = jnp.stack(radiance)

    if cfg.spectral:
        value = specradflux_to_ciexyz_hero_soa(
            tables, flux, lam0, cfg.n_wavelengths, cfg.lambda_step,
            lambda_min=cfg.lambda_min,
        )
    else:
        value = flux
    return LaneResult(value=value.T, alpha=camera_hit.astype(jnp.float32))
