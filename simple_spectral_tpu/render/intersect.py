"""Vectorized watertight ray-triangle intersection, TPU layout.

TPU-native re-design of ``PrimTri::intersect`` (reference
src/geometry.cpp:12-101, the Woop/Benthin/Wald JCGT 2013 watertight test).
A flat batch of N rays tests against all T triangles at once as pure VPU
element-wise work over ``[T, N]`` grids -- triangles on the sublane axis,
rays on the 128-wide lane axis, so register tiles are fully utilized (an
``[N, T, 3, 3]`` layout would pad its trailing dims 42x; see
render/vec.py docstring).  The closest hit per ray is a masked min over the
triangle axis; hit attributes come back through a one-hot masked reduction
instead of gathers.

Deviation from the reference, by design: the reference escalates to float64
when any scaled barycentric is exactly 0 (src/geometry.cpp:57-68).  TPU f64
is emulated and slow; we instead treat exact zeros as boundary-inclusive in
f32 (a zero component is compatible with either sign).  The affected set is
measure-zero for Monte-Carlo ray distributions; parity is validated on
converged images (SURVEY.md section 4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from simple_spectral_tpu.render.vec import V3, select3
from simple_spectral_tpu.scene.types import SceneData

INF = jnp.inf


class HitRecord(NamedTuple):
    """SoA hit record for a batch of rays (reference HitRecord,
    src/stdafx.hpp:222-233, flattened to lane vectors)."""

    hit: jnp.ndarray  # bool[N]
    dist: jnp.ndarray  # f32[N] (INF where miss)
    tri: jnp.ndarray  # i32[N] index of hit triangle (0 where miss)
    prim: jnp.ndarray  # i32[N] owning primitive id (-1 where miss)
    mat: jnp.ndarray  # i32[N] material id (0 where miss)
    normal: V3  # f32[N] x3 flat geometric normal
    st_s: jnp.ndarray  # f32[N] interpolated texture coordinate s
    st_t: jnp.ndarray  # f32[N] interpolated texture coordinate t


def _pick_axes(d: V3):
    """Watertight axis permutation: kz = argmax |d|, (kx, ky) cyclic, with
    kx/ky swapped when d[kz] < 0 to preserve winding (reference
    src/geometry.cpp:16-31).  All [N] int32."""
    ax, ay, az = jnp.abs(d.x), jnp.abs(d.y), jnp.abs(d.z)
    x_wins = (ax > ay) & (ax > az)
    y_wins = (~x_wins) & (ay > az)
    kz = jnp.where(x_wins, 0, jnp.where(y_wins, 1, 2))
    kx = jnp.where(kz == 2, 0, kz + 1)
    ky = jnp.where(kx == 2, 0, kx + 1)
    dz = select3(kz, d.x, d.y, d.z)
    neg = dz < 0.0
    kx, ky = jnp.where(neg, ky, kx), jnp.where(neg, kx, ky)
    return kx, ky, kz, dz


def intersect_rays_soa(
    scene: SceneData,
    o: V3,  # ray origins, f32[N] x3
    d: V3,  # ray directions, f32[N] x3
    ignore_prim: jnp.ndarray,  # i32[N]; -1 = ignore nothing
    eps: float,
    need_attrs: bool = True,
) -> HitRecord:
    """Closest-hit intersection of N rays against all scene triangles.

    Semantics: reference Scene::intersect (src/scene.cpp:433-445) over
    PrimQuad/PrimTri::intersect, with the `ignore` self-hit exclusion.

    ``need_attrs=False`` skips the normal/ST attribute reductions -- shadow
    rays only need (hit, dist, prim, mat).
    """
    kx, ky, kz, dz = _pick_axes(d)
    # dz == 0 only for an all-zero direction (dead/padded lanes; any real
    # direction's largest axis is nonzero); guard the divide so the sweep is
    # NaN-free even on masked lanes (cfg.debug_checks runs under full
    # checkify float_checks).  Such lanes produce garbage-but-finite dists
    # whose contributions are gated to 0 downstream.
    inv_dz = 1.0 / jnp.where(dz == 0.0, 1.0, dz)
    sx = select3(kx, d.x, d.y, d.z) * inv_dz  # f32[N]
    sy = select3(ky, d.x, d.y, d.z) * inv_dz
    sz = inv_dz

    tv = scene.tri_verts  # f32[T, 3(vert), 3(axis)]
    kxe, kye, kze = kx[None, :], ky[None, :], kz[None, :]
    oxe, oye, oze = o.x[None, :], o.y[None, :], o.z[None, :]

    def sheared(vert):
        # rel components of vertex `vert` along the permuted axes: f32[T, N]
        rx = tv[:, vert, 0][:, None] - oxe
        ry = tv[:, vert, 1][:, None] - oye
        rz = tv[:, vert, 2][:, None] - oze
        r_kx = select3(kxe, rx, ry, rz)
        r_ky = select3(kye, rx, ry, rz)
        r_kz = select3(kze, rx, ry, rz)
        return r_kx - sx[None, :] * r_kz, r_ky - sy[None, :] * r_kz, r_kz

    ax_a, ay_a, az_a = sheared(0)
    ax_b, ay_b, az_b = sheared(1)
    ax_c, ay_c, az_c = sheared(2)

    # Scaled barycentrics U,V,W = cross((Ay,By,Cy), (Ax,Bx,Cx)) (reference
    # src/geometry.cpp:52-56); all f32[T, N].
    u = ay_b * ax_c - ax_b * ay_c
    v = ay_c * ax_a - ax_c * ay_a
    w = ay_a * ax_b - ax_a * ay_b

    # Edge test, zero-inclusive (see module docstring re f64 fallback).
    inside = ((u >= 0.0) & (v >= 0.0) & (w >= 0.0)) | ((u <= 0.0) & (v <= 0.0) & (w <= 0.0))

    det = u + v + w
    ok_det = jnp.abs(det) > eps  # reference src/geometry.cpp:71-73

    t_scaled = sz[None, :] * (u * az_a + v * az_b + w * az_c)
    # Sign of T must match sign of det (reference src/geometry.cpp:79-84).
    same_sign = jnp.signbit(det) == jnp.signbit(t_scaled)

    # where-before-divide: det == 0 lanes are already excluded by ok_det
    # (eps > 0), so the guarded divisor changes no valid lane's dist.
    dist = t_scaled / jnp.where(det == 0.0, 1.0, det)
    not_ignored = scene.tri_prim[:, None] != ignore_prim[None, :]
    valid = inside & ok_det & same_sign & (dist >= eps) & not_ignored
    dist = jnp.where(valid, dist, INF)

    # Closest hit (reference keeps the min via `dist<hitrec->dist`,
    # src/geometry.cpp:88): masked min + one-hot attribute reduction.
    best_dist = jnp.min(dist, axis=0)  # f32[N]
    hit = jnp.isfinite(best_dist)
    n_tris = tv.shape[0]
    best = jnp.argmin(dist, axis=0).astype(jnp.int32)  # i32[N]
    iota_t = jax.lax.broadcasted_iota(jnp.int32, (n_tris, 1), 0)
    oh = iota_t == best[None, :]  # bool[T, N], exactly one True per lane

    def pick_f(col):  # f32[T] -> f32[N] via masked sum
        return jnp.sum(jnp.where(oh, col[:, None], 0.0), axis=0)

    def pick_i(col):  # i32[T] -> i32[N] via masked max (cols are >= -1)
        return jnp.max(jnp.where(oh, col[:, None], -1), axis=0)

    prim = jnp.where(hit, pick_i(scene.tri_prim), -1)
    mat = jnp.where(hit, pick_i(scene.tri_mat), 0)
    if not need_attrs:
        zero = jnp.zeros_like(best_dist)
        rec = HitRecord(
            hit=hit, dist=best_dist, tri=best, prim=prim, mat=mat,
            normal=V3(zero, zero, zero), st_s=zero, st_t=zero,
        )
        return _merge_spheres_soa(scene, o, d, ignore_prim, eps, rec, need_attrs)
    normal = V3(
        pick_f(scene.tri_normal[:, 0]),
        pick_f(scene.tri_normal[:, 1]),
        pick_f(scene.tri_normal[:, 2]),
    )

    # Barycentric ST interpolation (reference src/geometry.cpp:91-93).
    def pick2(arr):  # f32[T, N] -> f32[N] at the best triangle
        return jnp.sum(jnp.where(oh, arr, 0.0), axis=0)

    bu, bv, bw = pick2(u), pick2(v), pick2(w)
    bdet = bu + bv + bw
    inv_det = jnp.where(bdet != 0.0, 1.0 / jnp.where(bdet != 0.0, bdet, 1.0), 0.0)
    st = scene.tri_st  # f32[T, 3, 2]
    st_s = (
        bu * pick_f(st[:, 0, 0]) + bv * pick_f(st[:, 1, 0]) + bw * pick_f(st[:, 2, 0])
    ) * inv_det
    st_t = (
        bu * pick_f(st[:, 0, 1]) + bv * pick_f(st[:, 1, 1]) + bw * pick_f(st[:, 2, 1])
    ) * inv_det

    rec = HitRecord(
        hit=hit, dist=best_dist, tri=best, prim=prim, mat=mat,
        normal=normal, st_s=st_s, st_t=st_t,
    )
    return _merge_spheres_soa(scene, o, d, ignore_prim, eps, rec, need_attrs)


def _merge_spheres_soa(
    scene: SceneData, o: V3, d: V3, ignore_prim, eps: float,
    tri_rec: HitRecord, need_attrs: bool,
) -> HitRecord:
    """Dense [Sp, N] sphere sweep merged into the triangle closest hit.

    The brute-force analog of the BVH's sphere test (render/bvh.py) for
    small scenes and for the BVH parity oracle: every sphere against every
    lane as pure VPU work, closest root >= eps, masked min, one-hot
    attribute reduction.  No-op when the scene has no spheres (the three
    reference scenes).  Directions must be unit length (sphere quadratic
    assumes |d| = 1, as everywhere in the integrator).
    """
    if not scene.n_spheres:
        return tri_rec
    c = scene.sphere_center  # f32[Sp, 3]
    ocx = o.x[None, :] - c[:, 0][:, None]  # [Sp, N]
    ocy = o.y[None, :] - c[:, 1][:, None]
    ocz = o.z[None, :] - c[:, 2][:, None]
    r2 = (scene.sphere_radius * scene.sphere_radius)[:, None]
    bq = ocx * d.x[None, :] + ocy * d.y[None, :] + ocz * d.z[None, :]
    cq = ocx * ocx + ocy * ocy + ocz * ocz - r2
    disc = bq * bq - cq
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    near = -bq - sq
    far = -bq + sq
    dist = jnp.where(near >= eps, near, far)
    not_ign = scene.sphere_prim[:, None] != ignore_prim[None, :]
    valid = (disc > 0.0) & (dist >= eps) & not_ign
    dist = jnp.where(valid, dist, INF)

    s_best = jnp.min(dist, axis=0)  # f32[N]
    s_hit = jnp.isfinite(s_best)
    wins = s_best < tri_rec.dist  # sphere closer than best triangle
    n_sp = c.shape[0]
    s_idx = jnp.argmin(dist, axis=0).astype(jnp.int32)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (n_sp, 1), 0)
    oh = iota_s == s_idx[None, :]

    def pick_i(col):
        return jnp.max(jnp.where(oh, col[:, None], -1), axis=0)

    hit = tri_rec.hit | s_hit
    best = jnp.where(wins, s_best, tri_rec.dist)
    prim = jnp.where(wins, pick_i(scene.sphere_prim), tri_rec.prim)
    mat = jnp.where(wins, pick_i(scene.sphere_mat), tri_rec.mat)
    tri = jnp.where(wins, 0, tri_rec.tri)
    if not need_attrs:
        return HitRecord(
            hit=hit, dist=best, tri=tri, prim=prim, mat=mat,
            normal=tri_rec.normal, st_s=tri_rec.st_s, st_t=tri_rec.st_t,
        )

    def pick_f(col):
        return jnp.sum(jnp.where(oh, col[:, None], 0.0), axis=0)

    cx, cy, cz = pick_f(c[:, 0]), pick_f(c[:, 1]), pick_f(c[:, 2])
    rad = pick_f(scene.sphere_radius)
    safe = jnp.where(s_hit, s_best, 0.0)
    inv_r = 1.0 / jnp.maximum(rad, 1e-30)
    snx = (o.x + safe * d.x - cx) * inv_r
    sny = (o.y + safe * d.y - cy) * inv_r
    snz = (o.z + safe * d.z - cz) * inv_r
    # equirectangular sphere ST (extension; see render/bvh.py)
    sph_s = 0.5 + jnp.arctan2(snz, snx) / (2.0 * jnp.pi)
    sph_t = 0.5 - jnp.arcsin(jnp.clip(sny, -1.0, 1.0)) / jnp.pi
    normal = V3(
        jnp.where(wins, snx, tri_rec.normal.x),
        jnp.where(wins, sny, tri_rec.normal.y),
        jnp.where(wins, snz, tri_rec.normal.z),
    )
    st_s = jnp.where(wins, sph_s, tri_rec.st_s)
    st_t = jnp.where(wins, sph_t, tri_rec.st_t)
    return HitRecord(
        hit=hit, dist=best, tri=tri, prim=prim, mat=mat,
        normal=normal, st_s=st_s, st_t=st_t,
    )


def resolve_intersect_impl(impl: str, scene=None) -> str:
    """'auto' -> the XLA [T, N] dense sweep below ~32k primitives, the
    block-cull Pallas arm above.  Both thresholds are measured decisions
    (v5e, 262144 rays):

    - At cornell's 38 tris the dense sweep runs 826 Mrays/s vs 287 for the
      Pallas MXU best-key kernel (DMA/epilogue-bound at tiny T;
      tools/bench_intersect_micro.py).
    - At BVH scale the per-lane skip-link traversal (render/bvh.py) LOSES to
      the dense sweep everywhere up to at least 100k primitives
      (tools/bvh_micro_r04.json: 48 ms dense vs 3.6 s traversal at 10k tris,
      extrapolated-480 ms dense vs 22.6 s at 100k).  Root cause arithmetic:
      the dense sweep is VPU-bound at ~3.3 of 3.8 Tflop/s -- ~19 ps per
      (tri, ray) test -- while every traversal step pays a per-lane row
      gather at ~7 ns/index; one gathered word costs as much as ~370 dense
      triangle tests, and a traversal visits hundreds of entries.  A
      pointer-chasing structure cannot beat a saturated dense sweep on this
      hardware below ~1M primitives; the scale win has to come from
      BLOCK-level culling (amortize the irregular access over a ray block),
      not per-lane traversal.

    The scale win that DOES work is the block-cull arm (render/cull.py):
    amortize the irregular access over a 1024-lane block via per-cluster
    DMA + dense [L, 1024] tile tests.  Measured end-to-end on the full
    integrator mix (coherent camera + shadow + incoherent bounce sweeps;
    tools/stress_render_r04.json): dense still wins at 10k tris (1.45 s vs
    1.84 s per 18-sweep chunk), cull wins from ~30k up (5.24 s vs 5.75 s at
    50k; ~1.4x at 100k vs extrapolated dense) and scales sublinearly
    (~T^0.65 end-to-end, ~T^0.4 on pure-coherent sweeps,
    tools/cull_micro_r04.json).  'auto' therefore routes scenes past
    CULL_AUTO_THRESHOLD primitives to 'cull' when cluster tiles exist.

    'bvh' stays selectable (parity-tested vs the dense oracle,
    tests/test_bvh.py) as the semantic reference for acceleration-structure
    behavior; 'pallas' likewise (tests/test_intersect_pallas.py).
    """
    if impl == "auto":
        if (
            scene is not None
            and scene.cull_tiles is not None
            and scene.n_tris + scene.n_spheres >= CULL_AUTO_THRESHOLD
        ):
            return "cull"
        return "xla"
    return impl


# Measured end-to-end crossover between the dense sweep and the block-cull
# arm (tools/stress_render_r04.json; see resolve_intersect_impl docstring).
CULL_AUTO_THRESHOLD = 32768


def intersect_rays_pallas(
    scene: SceneData,
    o: V3,
    d: V3,
    ignore_prim: jnp.ndarray,
    eps: float,
    need_attrs: bool = True,
    interpret: bool = False,
) -> HitRecord:
    """Closest-hit via the Pallas MXU kernel + thin attribute recovery.

    The kernel (render/intersect_pallas.py) returns one packed int32 key per
    lane; this wrapper unpacks the winning triangle index and re-runs the
    watertight test (reference src/geometry.cpp:12-101) for that SINGLE
    triangle per lane -- a handful of gathers + VPU math in thin straight-line
    context -- recovering the exact distance (the packed key quantizes
    idx_bits low mantissa bits away) and the scaled barycentrics for ST
    interpolation.  Semantics match intersect_rays_soa; near-ties within the
    key quantization may resolve to a different (coplanar-equivalent)
    triangle, which converged-image parity absorbs.
    """
    from simple_spectral_tpu.render.intersect_pallas import (
        INF_BITS,
        intersect_best_key,
        key_idx_mask,
    )

    best_key = intersect_best_key(
        scene.tri_verts, scene.tri_prim, o, d, ignore_prim, eps, interpret=interpret
    )
    idx_mask = key_idx_mask(scene.tri_verts.shape[0])
    hit = best_key < INF_BITS
    tri = jnp.where(hit, best_key & idx_mask, 0).astype(jnp.int32)
    prim = jnp.where(hit, jnp.take(scene.tri_prim, tri), -1)
    mat = jnp.where(hit, jnp.take(scene.tri_mat, tri), 0)

    if not need_attrs:
        # Shadow/final-emission rays read only (hit, prim, mat); return the
        # key's quantized distance rather than paying the recompute.
        dist_q = jax.lax.bitcast_convert_type(best_key & ~idx_mask, jnp.float32)
        dist = jnp.where(hit, dist_q, INF)
        zero = jnp.zeros_like(dist)
        return HitRecord(
            hit=hit, dist=dist, tri=tri, prim=prim, mat=mat,
            normal=V3(zero, zero, zero), st_s=zero, st_t=zero,
        )

    # --- attribute recovery: one winning triangle per lane ---
    kx, ky, kz, dz = _pick_axes(d)
    inv_dz = 1.0 / jnp.where(dz == 0.0, 1.0, dz)  # see intersect_rays_soa
    sx = select3(kx, d.x, d.y, d.z) * inv_dz
    sy = select3(ky, d.x, d.y, d.z) * inv_dz
    sz = inv_dz
    tv = jnp.take(scene.tri_verts, tri, axis=0)  # f32[N, 3, 3]

    def sheared(vert):
        rx = tv[:, vert, 0] - o.x
        ry = tv[:, vert, 1] - o.y
        rz = tv[:, vert, 2] - o.z
        r_kx = select3(kx, rx, ry, rz)
        r_ky = select3(ky, rx, ry, rz)
        r_kz = select3(kz, rx, ry, rz)
        return r_kx - sx * r_kz, r_ky - sy * r_kz, r_kz

    ax_a, ay_a, az_a = sheared(0)
    ax_b, ay_b, az_b = sheared(1)
    ax_c, ay_c, az_c = sheared(2)
    u = ay_b * ax_c - ax_b * ay_c
    v = ay_c * ax_a - ax_c * ay_a
    w = ay_a * ax_b - ax_a * ay_b
    det = u + v + w
    t_scaled = sz * (u * az_a + v * az_b + w * az_c)
    safe_det = jnp.where(det != 0.0, det, 1.0)
    # The kernel only reports triangles with |det| > eps and dist >= eps, so
    # dist is well-defined wherever hit; guard miss lanes anyway.
    dist = jnp.where(hit & (det != 0.0), t_scaled / safe_det, INF)

    normal = V3(
        jnp.take(scene.tri_normal[:, 0], tri),
        jnp.take(scene.tri_normal[:, 1], tri),
        jnp.take(scene.tri_normal[:, 2], tri),
    )
    st = jnp.take(scene.tri_st, tri, axis=0)  # f32[N, 3, 2]
    inv_det = jnp.where(det != 0.0, 1.0 / safe_det, 0.0)
    st_s = (u * st[:, 0, 0] + v * st[:, 1, 0] + w * st[:, 2, 0]) * inv_det
    st_t = (u * st[:, 0, 1] + v * st[:, 1, 1] + w * st[:, 2, 1]) * inv_det
    return HitRecord(
        hit=hit, dist=dist, tri=tri, prim=prim, mat=mat,
        normal=normal, st_s=st_s, st_t=st_t,
    )


def intersect_rays_soa2(
    scene: SceneData,
    o: V3,
    d: V3,
    ignore_prim: jnp.ndarray,
    eps: float,
    need_attrs: bool = True,
) -> HitRecord:
    """Two-pass recompute formulation of :func:`intersect_rays_soa`.

    The single-pass version's argmin + one-hot attribute reductions give the
    [T, N] intermediates (u, v, w, dist, one-hot) MANY consumers, which can
    make XLA materialize them to HBM (~40 MB each at N=2^18) instead of
    fusing.  Here pass 1 reduces a packed (quantized-dist | tri-index) int32
    key to its min per lane -- one fused reduction, nothing materialized --
    and pass 2 recomputes the identical per-(t, n) terms and reduces every
    attribute against (key == best_key), a second fused multi-output
    reduction.  2x the arithmetic, O(N) traffic.  Key packing follows the
    Pallas kernel (render/intersect_pallas.py): positive-float bits are
    monotonic as int32, so dropping ceil(log2 T) mantissa bits for the index
    keeps min-by-key == min-by-dist up to ties within 2^-(23-idx_bits)
    relative, which resolve deterministically to the lowest triangle index
    (the single-pass argmin picks the first of exactly-equal dists; converged
    -image parity absorbs the measure-zero difference).  The RETURNED dist is
    exact (recovered in pass 2), not the quantized prefix.
    """
    n_tris = scene.tri_verts.shape[0]
    idx_bits = max(1, (n_tris - 1).bit_length())
    idx_mask = (1 << idx_bits) - 1
    inf_key = jnp.int32(0x7F800000)

    kx, ky, kz, dz = _pick_axes(d)
    inv_dz = 1.0 / jnp.where(dz == 0.0, 1.0, dz)  # see intersect_rays_soa
    sx = select3(kx, d.x, d.y, d.z) * inv_dz
    sy = select3(ky, d.x, d.y, d.z) * inv_dz
    sz = inv_dz

    tv = scene.tri_verts
    kxe, kye, kze = kx[None, :], ky[None, :], kz[None, :]
    oxe, oye, oze = o.x[None, :], o.y[None, :], o.z[None, :]

    def terms():
        """Per-(T, N) watertight terms; traced twice ON PURPOSE (pass 2
        recomputes instead of re-reading pass 1's intermediates)."""

        def sheared(vert):
            rx = tv[:, vert, 0][:, None] - oxe
            ry = tv[:, vert, 1][:, None] - oye
            rz = tv[:, vert, 2][:, None] - oze
            r_kx = select3(kxe, rx, ry, rz)
            r_ky = select3(kye, rx, ry, rz)
            r_kz = select3(kze, rx, ry, rz)
            return r_kx - sx[None, :] * r_kz, r_ky - sy[None, :] * r_kz, r_kz

        ax_a, ay_a, az_a = sheared(0)
        ax_b, ay_b, az_b = sheared(1)
        ax_c, ay_c, az_c = sheared(2)
        u = ay_b * ax_c - ax_b * ay_c
        v = ay_c * ax_a - ax_c * ay_a
        w = ay_a * ax_b - ax_a * ay_b
        inside = ((u >= 0.0) & (v >= 0.0) & (w >= 0.0)) | (
            (u <= 0.0) & (v <= 0.0) & (w <= 0.0)
        )
        det = u + v + w
        ok_det = jnp.abs(det) > eps
        t_scaled = sz[None, :] * (u * az_a + v * az_b + w * az_c)
        same_sign = jnp.signbit(det) == jnp.signbit(t_scaled)
        dist = t_scaled / jnp.where(det == 0.0, 1.0, det)
        not_ignored = scene.tri_prim[:, None] != ignore_prim[None, :]
        valid = inside & ok_det & same_sign & (dist >= eps) & not_ignored
        return u, v, w, dist, valid

    def keys_of(dist, valid):
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (n_tris, 1), 0)
        bits = jax.lax.bitcast_convert_type(dist, jnp.int32)
        key = (bits & ~jnp.int32(idx_mask)) | iota_t
        return jnp.where(valid, key, inf_key)

    # pass 1: min packed key per lane (one fused reduction)
    u, v, w, dist, valid = terms()
    best_key = jnp.min(keys_of(dist, valid), axis=0)
    hit = best_key < inf_key

    # pass 2: recompute, reduce attributes against the winner
    u, v, w, dist, valid = terms()
    oh = keys_of(dist, valid) == best_key[None, :]  # exactly one True on hit

    def pick_f(arr):  # f32[T, N] | f32[T] broadcast -> f32[N]
        a = arr if arr.ndim == 2 else arr[:, None]
        return jnp.sum(jnp.where(oh, a, 0.0), axis=0)

    def pick_i(col):  # i32[T] -> i32[N]
        return jnp.max(jnp.where(oh, col[:, None], -1), axis=0)

    best_dist = jnp.where(hit, pick_f(dist), INF)
    prim = jnp.where(hit, pick_i(scene.tri_prim), -1)
    mat = jnp.where(hit, pick_i(scene.tri_mat), 0)
    tri = jnp.where(hit, pick_i(jnp.arange(n_tris, dtype=jnp.int32)), 0)
    if not need_attrs:
        zero = jnp.zeros_like(best_dist)
        return HitRecord(
            hit=hit, dist=best_dist, tri=tri, prim=prim, mat=mat,
            normal=V3(zero, zero, zero), st_s=zero, st_t=zero,
        )

    normal = V3(
        pick_f(scene.tri_normal[:, 0]),
        pick_f(scene.tri_normal[:, 1]),
        pick_f(scene.tri_normal[:, 2]),
    )
    bu, bv, bw = pick_f(u), pick_f(v), pick_f(w)
    bdet = bu + bv + bw
    inv_det = jnp.where(bdet != 0.0, 1.0 / jnp.where(bdet != 0.0, bdet, 1.0), 0.0)
    st = scene.tri_st
    st_s = (
        bu * pick_f(st[:, 0, 0]) + bv * pick_f(st[:, 1, 0]) + bw * pick_f(st[:, 2, 0])
    ) * inv_det
    st_t = (
        bu * pick_f(st[:, 0, 1]) + bv * pick_f(st[:, 1, 1]) + bw * pick_f(st[:, 2, 1])
    ) * inv_det
    return HitRecord(
        hit=hit, dist=best_dist, tri=tri, prim=prim, mat=mat,
        normal=normal, st_s=st_s, st_t=st_t,
    )


def intersect_rays_dispatch(
    scene: SceneData,
    o: V3,
    d: V3,
    ignore_prim: jnp.ndarray,
    eps: float,
    need_attrs: bool = True,
    impl: str = "auto",
) -> HitRecord:
    """Route the closest-hit sweep to the configured implementation."""
    r = resolve_intersect_impl(impl, scene)
    if r == "bvh":
        from simple_spectral_tpu.render.bvh import intersect_rays_bvh

        if scene.bvh_nodes is None:
            raise ValueError(
                "intersect_impl='bvh' but the scene has no BVH (built when "
                "primitive count >= cfg.bvh_threshold, scene/library.py)"
            )
        return intersect_rays_bvh(scene, o, d, ignore_prim, eps, need_attrs)
    if r == "cull":
        from simple_spectral_tpu.render.cull import intersect_rays_cull

        if scene.cull_tiles is None:
            raise ValueError(
                "intersect_impl='cull' but the scene has no cluster tiles "
                "(built when primitive count >= cfg.bvh_threshold)"
            )
        return intersect_rays_cull(scene, o, d, ignore_prim, eps, need_attrs)
    if r in ("pallas", "xla2") and scene.n_spheres:
        raise ValueError(f"intersect_impl={r!r} does not support spheres; use bvh/xla")
    if r == "pallas":
        return intersect_rays_pallas(scene, o, d, ignore_prim, eps, need_attrs)
    if r == "xla2":
        return intersect_rays_soa2(scene, o, d, ignore_prim, eps, need_attrs)
    return intersect_rays_soa(scene, o, d, ignore_prim, eps, need_attrs)


def intersect_rays(scene, ray_orig, ray_dir, ignore_prim, eps: float):
    """Row-vector convenience wrapper: f32[N,3] origins/dirs in, HitRecord
    out (normal as V3).  Prefer intersect_rays_soa in hot code."""
    from simple_spectral_tpu.render.vec import v3_from_rows

    return intersect_rays_soa(
        scene, v3_from_rows(ray_orig), v3_from_rows(ray_dir), ignore_prim, eps
    )
