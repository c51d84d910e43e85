"""Wavefront path-tracing integrator (SoA layout).

The reference's recursive per-ray lambda ``L`` (reference
src/renderer.cpp:147-255) is inverted into a flat array-of-lanes program: one
lane = one (pixel, sample) pair carrying (origin, direction, throughput,
accumulated radiance, aliveness) as lane vectors -- positions as V3 tuples of
``f32[N]``, spectra as ``f32[S, N]`` (see render/vec.py for the layout rule).
A ``lax.scan`` over bounce depth runs the loop body -- intersect-all-
triangles, masked emission add, next-event estimation, branchless BSDF sample
-- on every lane simultaneously; dead lanes are masked rather than retired
(cornell paths rarely terminate early since the reference has no russian
roulette, so lane waste is small).

Differentiable: radiance is linear in the material emission tables and
polynomial in the albedo tables; the discrete hit structure (which triangle,
which direction) does not depend on those leaves, so reverse-mode AD through
this function yields the correct light-transport gradients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.intersect import intersect_rays_soa
from simple_spectral_tpu.render.sampling import (
    rand_toward_spherical_triangle,
    spherical_triangle,
    uniform,
)
from simple_spectral_tpu.render.shading import (
    evaluate_albedo_cached,
    evaluate_bsdf_from_albedo,
    evaluate_emission_cached,
    interact_bsdf_from_albedo,
    is_mirror_mask,
    material_onehot,
    precompute_constant_spectra,
    select_column,
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
    pdf (= solid_angle * 2 * n_lights) is returned instead of the pdf so the
    degenerate-triangle case (solid angle 0) contributes exactly 0 without
    NaN (the reference reaches the same value via pdf = inf)."""
    n = from_pos.x.shape[0]
    k_choice, k_tri, k_arvo = jax.random.split(key, 3)
    n_lights = scene.n_lights
    light_idx = jax.random.randint(k_choice, (n,), 0, n_lights)
    light_prim = select_column(scene.light_prims, light_idx, n_lights)
    # 50/50 triangle choice within the quad (reference src/geometry.cpp:141-145)
    pick = (uniform(k_tri, (n,)) > 0.5).astype(jnp.int32)
    flat_choice = light_idx * 2 + pick  # index into light_tris.reshape(-1)
    # light triangle vertices, gathered once (tiny: [2L, 3, 3])
    lt_verts = scene.tri_verts[scene.light_tris.reshape(-1)]

    def vert(v):
        comps = []
        for a in range(3):
            acc = jnp.broadcast_to(lt_verts[0, v, a], (n,))
            for li in range(1, 2 * n_lights):
                acc = jnp.where(flat_choice == li, lt_verts[li, v, a], acc)
            comps.append(acc)
        return V3(*comps)

    a = normalize(vert(0) - from_pos)
    b = normalize(vert(1) - from_pos)
    c = normalize(vert(2) - from_pos)
    tri = spherical_triangle(a, b, c)
    d = rand_toward_spherical_triangle(k_arvo, tri)
    inv_pdf = tri.area * (2.0 * n_lights)
    return d, inv_pdf, light_prim


class LaneResult(NamedTuple):
    value: jnp.ndarray  # f32[N, 3]: XYZ (spectral) or lRGB flux estimate
    alpha: jnp.ndarray  # f32[N]: 1 where the camera ray hit anything


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

    # material spectra depend only on lam0: hoist out of the depth loop
    cache = precompute_constant_spectra(scene, cfg, lam0)

    def emission_gate(live_hit, depth):
        # reference src/renderer.cpp:167-175; with ELS, last_was_delta is
        # true only for the camera ray
        gate = live_hit & (depth == 0) if cfg.els else live_hit
        if cfg.indirect_only:
            gate = gate & (depth > 0)
        return gate

    def body(carry, depth):
        """One full bounce: intersect, emission, NEE, BSDF continuation.
        Runs for depth = 0 .. max_depth-2; the final depth adds emission
        only (reference gates NEE/bounce on depth+1 < MAX_DEPTH,
        src/renderer.cpp:178)."""
        (o, d, ignore, beta, radiance, alive, camera_hit) = carry
        kd = jax.random.fold_in(k_scan, depth)
        k_nee, k_bsdf = jax.random.split(kd)

        rec = intersect_rays_soa(scene, o, d, ignore, cfg.eps)
        live_hit = alive & rec.hit
        camera_hit = camera_hit | (live_hit & (depth == 0))
        oh = material_onehot(scene.materials.n_materials, rec.mat)

        emitted = evaluate_emission_cached(scene, cfg, cache, oh)
        radiance = radiance + jnp.where(
            emission_gate(live_hit, depth)[None, :], beta * emitted, 0.0
        )

        more = live_hit
        hit_dist = jnp.where(jnp.isfinite(rec.dist), rec.dist, 0.0)
        hit_pos = o + hit_dist * d

        # albedo evaluated once per bounce, shared by NEE + BSDF sample
        albedo = evaluate_albedo_cached(
            scene, tables, cfg, cache, rec.mat, oh, rec.st_s, rec.st_t, lam0
        )
        is_mirror = is_mirror_mask(scene, rec.mat)

        # Next-event estimation (src/renderer.cpp:182-220)
        if cfg.els:
            shad_d, inv_pdf, light_prim = _sample_light_dir(k_nee, scene, hit_pos)
            n_dot_l = dot(shad_d, rec.normal)
            nee_gate = more & (n_dot_l > 0.0)
            if cfg.indirect_only:
                nee_gate = nee_gate & (depth > 0)
            shad_rec = intersect_rays_soa(
                scene, hit_pos, shad_d, rec.prim, cfg.eps, need_attrs=False
            )
            nee_gate = nee_gate & (shad_rec.prim == light_prim)
            oh_shad = material_onehot(scene.materials.n_materials, shad_rec.mat)
            light_emit = evaluate_emission_cached(scene, cfg, cache, oh_shad)
            f_s_nee = evaluate_bsdf_from_albedo(albedo, is_mirror)
            contrib = light_emit * (n_dot_l * inv_pdf)[None, :] * f_s_nee
            radiance = radiance + jnp.where(nee_gate[None, :], beta * contrib, 0.0)

        # BSDF sample + throughput update (src/renderer.cpp:222-250)
        w_i, pdf, f_s, is_delta = interact_bsdf_from_albedo(
            k_bsdf, cfg, albedo, is_mirror, -d, rec.normal
        )
        n_dot_l_b = dot(w_i, rec.normal)
        # delta convention: n.l := 1, pdf := 1 (src/renderer.cpp:234-243)
        n_dot_l_b = jnp.where(is_delta, 1.0, n_dot_l_b)
        pdf = jnp.where(is_delta, 1.0, pdf)
        f_nonzero = jnp.sum(f_s * f_s, axis=0) > 0.0
        cont = more & f_nonzero & (n_dot_l_b > 0.0)
        weight = jnp.where(cont, n_dot_l_b / jnp.where(pdf > 0.0, pdf, 1.0), 0.0)
        beta = beta * jnp.where(cont[None, :], f_s * weight[None, :], 1.0)

        o = v3where(cont, hit_pos, o)
        d = v3where(cont, w_i, d)
        ignore = jnp.where(cont, rec.prim, ignore)
        alive = cont
        return (o, d, ignore, beta, radiance, alive, camera_hit), None

    init = (
        ray_o,
        ray_d,
        jnp.full((n,), -1, jnp.int32),
        jnp.ones((s_dim, n), jnp.float32),
        jnp.zeros((s_dim, n), jnp.float32),
        jnp.ones((n,), bool),
        jnp.zeros((n,), bool),
    )
    if cfg.max_depth > 1:
        carry, _ = jax.lax.scan(
            body, init, jnp.arange(cfg.max_depth - 1, dtype=jnp.int32)
        )
    else:
        carry = init
    # final depth: emission only (no NEE, no bounce, no attribute pickup)
    (o, d, ignore, beta, radiance, alive, camera_hit) = carry
    rec = intersect_rays_soa(scene, o, d, ignore, cfg.eps, need_attrs=False)
    live_hit = alive & rec.hit
    camera_hit = camera_hit | (live_hit & (cfg.max_depth == 1))
    oh = material_onehot(scene.materials.n_materials, rec.mat)
    emitted = evaluate_emission_cached(scene, cfg, cache, oh)
    last_depth = jnp.int32(cfg.max_depth - 1)
    radiance = radiance + jnp.where(
        emission_gate(live_hit, last_depth)[None, :], beta * emitted, 0.0
    )

    # Flat-field correction (reference src/renderer.cpp:262-266): by default
    # the radiance estimate *is* the flux estimate; otherwise weight by the
    # cosine to the camera forward axis.
    if cfg.flat_field:
        flux = radiance
    else:
        cosw = dot(cam_dir0, splat(scene.camera.forward, cam_dir0.x))
        flux = radiance * cosw[None, :]

    if cfg.spectral:
        value = specradflux_to_ciexyz_hero_soa(
            tables, flux, lam0, cfg.n_wavelengths, cfg.lambda_step
        )
    else:
        value = flux
    return LaneResult(value=value.T, alpha=camera_hit.astype(jnp.float32))
