"""Vectorized watertight ray-triangle intersection.

TPU-native re-design of ``PrimTri::intersect`` (reference
src/geometry.cpp:12-101, the Woop/Benthin/Wald JCGT 2013 watertight test):
instead of one ray against one triangle behind virtual dispatch, a flat batch
of rays is tested against *all* triangles at once -- pure VPU element-wise
work over an ``[N, T]`` grid, with the closest hit selected by a masked
arg-min.  Quads are two triangles sharing a primitive id (reference
src/geometry.cpp:128-139), so "re-tag the hit to the owning quad" is just a
gather of ``tri_prim``.

Deviation from the reference, by design: the reference escalates to float64
when any scaled barycentric is exactly 0 (src/geometry.cpp:57-68).  TPU f64
is emulated and slow; we instead treat exact zeros as boundary-inclusive in
f32 (a zero component is compatible with either sign).  The affected set is
measure-zero for Monte-Carlo ray distributions; parity is validated on
converged images (SURVEY.md section 4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from simple_spectral_tpu.scene.types import SceneData

INF = jnp.inf


class HitRecord(NamedTuple):
    """SoA hit record for a batch of rays (reference HitRecord,
    src/stdafx.hpp:222-233, flattened)."""

    hit: jnp.ndarray  # bool[N]
    dist: jnp.ndarray  # f32[N] (INF where miss)
    tri: jnp.ndarray  # i32[N] index of hit triangle (0 where miss)
    prim: jnp.ndarray  # i32[N] owning primitive id (-1 where miss)
    mat: jnp.ndarray  # i32[N] material id (0 where miss)
    normal: jnp.ndarray  # f32[N,3] flat geometric normal
    st: jnp.ndarray  # f32[N,2] interpolated texture coordinate


def _pick_axes(d):
    """Watertight axis permutation: kz = argmax |d|, (kx, ky) cyclic, with
    kx/ky swapped when d[kz] < 0 to preserve winding (reference
    src/geometry.cpp:16-31)."""
    ad = jnp.abs(d)
    # NOTE the reference's chain picks z on ties exactly like argmax-last;
    # its logic is: kz = x if x>y and x>z else (y if y>z else z).
    x_wins = (ad[..., 0] > ad[..., 1]) & (ad[..., 0] > ad[..., 2])
    y_wins = (~x_wins) & (ad[..., 1] > ad[..., 2])
    kz = jnp.where(x_wins, 0, jnp.where(y_wins, 1, 2))
    kx = jnp.where(kz == 2, 0, kz + 1)
    ky = jnp.where(kx == 2, 0, kx + 1)
    dz = jnp.take_along_axis(d, kz[..., None], axis=-1)[..., 0]
    neg = dz < 0.0
    kx, ky = jnp.where(neg, ky, kx), jnp.where(neg, kx, ky)
    return kx, ky, kz


def intersect_rays(
    scene: SceneData,
    ray_orig: jnp.ndarray,  # f32[N,3]
    ray_dir: jnp.ndarray,  # f32[N,3]
    ignore_prim: jnp.ndarray,  # i32[N]; -1 = ignore nothing
    eps: float,
) -> HitRecord:
    """Closest-hit intersection of N rays against all scene triangles.

    Semantics: reference Scene::intersect (src/scene.cpp:433-445) over
    PrimQuad/PrimTri::intersect, with the `ignore` self-hit exclusion.
    """
    kx, ky, kz = _pick_axes(ray_dir)  # i32[N] each

    def comp(v, k):
        # v: f32[N, ..., 3]; k: i32[N] -> component k of the last axis.
        kk = k.reshape(k.shape + (1,) * (v.ndim - k.ndim))
        kk = jnp.broadcast_to(kk, v.shape[:-1] + (1,))
        return jnp.take_along_axis(v, kk, axis=-1)[..., 0]

    dz = comp(ray_dir, kz)
    sx = comp(ray_dir, kx) / dz
    sy = comp(ray_dir, ky) / dz
    sz = 1.0 / dz  # f32[N]

    # Vertices relative to ray origin: f32[N, T, 3(vert), 3(axis)]
    rel = scene.tri_verts[None, :, :, :] - ray_orig[:, None, None, :]
    # Components along the permuted axes: f32[N, T, 3(vert)]
    relx = comp(rel, kx)
    rely = comp(rel, ky)
    relz = comp(rel, kz)

    ax = relx - sx[:, None, None] * relz  # f32[N,T,3] = (Ax,Bx,Cx)
    ay = rely - sy[:, None, None] * relz

    # Scaled barycentrics: U = By*Cx - Bx*Cy etc. (cross(ABCy, ABCx);
    # reference src/geometry.cpp:52-56).
    u = ay[..., 1] * ax[..., 2] - ax[..., 1] * ay[..., 2]
    v = ay[..., 2] * ax[..., 0] - ax[..., 2] * ay[..., 0]
    w = ay[..., 0] * ax[..., 1] - ax[..., 0] * ay[..., 1]

    # Edge test, zero-inclusive (see module docstring re f64 fallback).
    inside = ((u >= 0.0) & (v >= 0.0) & (w >= 0.0)) | ((u <= 0.0) & (v <= 0.0) & (w <= 0.0))

    det = u + v + w
    ok_det = jnp.abs(det) > eps  # reference src/geometry.cpp:71-73

    t_scaled = sz[:, None] * (
        u * relz[..., 0] + v * relz[..., 1] + w * relz[..., 2]
    )
    # Sign of T must match sign of det (reference src/geometry.cpp:79-84).
    same_sign = jnp.signbit(det) == jnp.signbit(t_scaled)

    dist = t_scaled / det
    not_ignored = scene.tri_prim[None, :] != ignore_prim[:, None]
    valid = inside & ok_det & same_sign & (dist >= eps) & not_ignored
    dist = jnp.where(valid, dist, INF)

    # Closest hit (reference keeps the min via `dist<hitrec->dist`,
    # src/geometry.cpp:88).
    best = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # i32[N]
    best_dist = jnp.take_along_axis(dist, best[:, None], axis=-1)[:, 0]
    hit = jnp.isfinite(best_dist)

    take = lambda a: a[best]  # gather per-ray triangle attributes
    prim = jnp.where(hit, take(scene.tri_prim), -1)
    mat = jnp.where(hit, take(scene.tri_mat), 0)
    normal = take(scene.tri_normal)

    # Barycentric ST interpolation (reference src/geometry.cpp:91-93).
    bu = jnp.take_along_axis(u, best[:, None], axis=-1)[:, 0]
    bv = jnp.take_along_axis(v, best[:, None], axis=-1)[:, 0]
    bw = jnp.take_along_axis(w, best[:, None], axis=-1)[:, 0]
    bdet = bu + bv + bw
    inv_det = jnp.where(bdet != 0.0, 1.0 / bdet, 0.0)
    sts = take(scene.tri_st)  # f32[N,3,2]
    st = (
        (bu * inv_det)[:, None] * sts[:, 0]
        + (bv * inv_det)[:, None] * sts[:, 1]
        + (bw * inv_det)[:, None] * sts[:, 2]
    )

    return HitRecord(hit=hit, dist=best_dist, tri=best, prim=prim, mat=mat, normal=normal, st=st)
