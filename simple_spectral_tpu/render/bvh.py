"""BVH-accelerated closest-hit intersection for BVH-scale scenes.

The reference has NO acceleration structure: its scene intersect is a linear
loop over 38 triangles (reference src/scene.cpp:433-445), with bounding
spheres existing only on an unused light-sampling path (reference
src/scene.cpp:420-425).  The north star asks for "BVH traversal over
triangles/quads/spheres" as the scale path this framework adds beyond the
reference -- this module is that path.

TPU-first design, NOT a GPU-style per-thread stack walk:

* **Host build** (:func:`build_bvh_arrays`): binned-SAH binary BVH over all
  primitives (triangles + spheres), flattened into ONE skip-link entry array
  in DFS preorder.  Each entry is a packed 48-byte row (f32[12], ints
  bitcast) that is either an internal AABB node, a triangle (its 9 vertex
  floats inline), or a sphere.  Inlining primitive data into the entry row
  means the device traversal needs exactly ONE row gather per step --
  gathers are the dominant cost on TPU (~7 ns/index, scaling with row
  width; tools/bench_gather_micro.py), so one 48-byte gather per step beats
  separate node/vertex indirections.

* **Device traversal** (:func:`intersect_rays_bvh`): all lanes advance in
  lockstep through a ``lax.while_loop``; per-lane state is just
  (ptr, best_dist, best_entry).  Skip links make the walk stackless: an
  internal node whose AABB is hit (within [eps, best_dist]) descends to
  ``ptr + 1`` (DFS preorder: the first child is adjacent), otherwise jumps
  its whole subtree via the skip link; primitive entries always advance to
  ``ptr + 1`` after a closest-hit update.  ``ptr`` strictly increases every
  step, so the loop terminates in at most n_entries iterations; in practice
  it runs max-over-lanes visited entries, which SAH keeps at
  O(log T + hits).  There is NO per-lane stack (per-lane dynamic stacks
  need a scatter+gather per step on TPU) and no distance-ordered descent
  (ordering is baked at build time; the best_dist prune in the slab test
  recovers most of the benefit).

All tests are branchless VPU math; the watertight triangle test reuses the
per-lane shear constants of the dense sweep (render/intersect.py
_pick_axes; reference src/geometry.cpp:12-101 semantics), so BVH results
match the brute-force oracle exactly up to closest-hit ties
(tests/test_bvh.py asserts agreement on random rays and full renders).

Differentiability: intersection structure is constant w.r.t. the material
leaves (render/integrator.py stop-gradients phase 1), so the while_loop
never carries tangents and needs no custom AD rules.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simple_spectral_tpu.render.vec import V3, select3

# Entry kinds (word 0 of each packed row).
KIND_INTERNAL = 0
KIND_TRI = 1
KIND_SPHERE = 2

ROW_WIDTH = 12  # f32 words per entry (48 bytes)

_INF = np.float32(np.inf)


def _aabb_area(mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    e = np.maximum(mx - mn, 0.0)
    return 2.0 * (e[..., 0] * e[..., 1] + e[..., 1] * e[..., 2] + e[..., 2] * e[..., 0])


def _split_sah(idxs, cent, mn, mx, n_bins: int = 16):
    """Binned-SAH split of a primitive subset; guaranteed non-degenerate
    (both halves non-empty).  Returns (left_idxs, right_idxs)."""
    c = cent[idxs]
    cmin = c.min(axis=0)
    cmax = c.max(axis=0)
    axis = int(np.argmax(cmax - cmin))
    extent = float(cmax[axis] - cmin[axis])
    if extent < 1e-12:
        half = len(idxs) // 2  # all centroids coincide: arbitrary halves
        return idxs[:half], idxs[half:]
    scale = n_bins / extent
    b = np.minimum(((c[:, axis] - cmin[axis]) * scale).astype(np.int64), n_bins - 1)
    counts = np.bincount(b, minlength=n_bins)
    bmn = np.full((n_bins, 3), _INF, np.float64)
    bmx = np.full((n_bins, 3), -_INF, np.float64)
    np.minimum.at(bmn, b, mn[idxs])
    np.maximum.at(bmx, b, mx[idxs])
    # prefix (left) and suffix (right) unions over bin boundaries
    lmn = np.minimum.accumulate(bmn, axis=0)
    lmx = np.maximum.accumulate(bmx, axis=0)
    rmn = np.minimum.accumulate(bmn[::-1], axis=0)[::-1]
    rmx = np.maximum.accumulate(bmx[::-1], axis=0)[::-1]
    nl = np.cumsum(counts)[:-1]  # split after bin i: bins 0..i left
    nr = len(idxs) - nl
    cost = nl * _aabb_area(lmn[:-1], lmx[:-1]) + nr * _aabb_area(rmn[1:], rmx[1:])
    cost = np.where((nl == 0) | (nr == 0), np.inf, cost)
    best = int(np.argmin(cost))
    if not np.isfinite(cost[best]):
        half = len(idxs) // 2
        order = np.argsort(c[:, axis], kind="stable")
        return idxs[order[:half]], idxs[order[half:]]
    sel = b <= best
    return idxs[sel], idxs[~sel]


def build_bvh_arrays(
    tri_verts: np.ndarray,  # f[T, 3, 3]
    tri_prim: np.ndarray,  # i[T]
    tri_mat: np.ndarray,  # i[T]
    sphere_center: Optional[np.ndarray] = None,  # f[Sp, 3]
    sphere_radius: Optional[np.ndarray] = None,  # f[Sp]
    sphere_prim: Optional[np.ndarray] = None,  # i[Sp]
    sphere_mat: Optional[np.ndarray] = None,  # i[Sp]
    leaf_size: int = 4,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the flattened skip-link BVH on the host.

    Returns (nodes f32[Nn, 12], entry_ref i32[Nn], entry_mat i32[Nn]).
    entry_ref holds the original triangle index (tri entries) / sphere index
    (sphere entries) / -1 (internal) for attribute recovery.
    """
    tri_verts = np.asarray(tri_verts, np.float64)
    t = tri_verts.shape[0]
    sp = 0 if sphere_center is None else int(np.shape(sphere_center)[0])
    p = t + sp
    assert p > 0, "empty scene"

    mn = np.empty((p, 3), np.float64)
    mx = np.empty((p, 3), np.float64)
    mn[:t] = tri_verts.min(axis=1)
    mx[:t] = tri_verts.max(axis=1)
    if sp:
        sc = np.asarray(sphere_center, np.float64)
        sr = np.asarray(sphere_radius, np.float64)[:, None]
        mn[t:] = sc - sr
        mx[t:] = sc + sr
    cent = 0.5 * (mn + mx)

    prim_id = np.concatenate(
        [np.asarray(tri_prim, np.int64)]
        + ([np.asarray(sphere_prim, np.int64)] if sp else [])
    )
    mat_id = np.concatenate(
        [np.asarray(tri_mat, np.int64)]
        + ([np.asarray(sphere_mat, np.int64)] if sp else [])
    )

    # DFS with an explicit stack ("node" to expand, "patch" to backfill the
    # internal entry's skip link once its subtree is emitted).
    kinds: list = []
    skips: list = []
    refs: list = []
    internal_pos: list = []  # positions of internal entries (parallel aabbs)
    internal_mn: list = []
    internal_mx: list = []
    prim_pos: list = []  # positions of primitive entries
    prim_idx: list = []  # global primitive index at those positions

    stack = [("node", np.arange(p, dtype=np.int64))]
    while stack:
        tag, x = stack.pop()
        if tag == "patch":
            skips[x] = len(kinds)
            continue
        idxs = x
        if len(idxs) <= leaf_size:
            for gi in idxs:
                pos = len(kinds)
                kinds.append(KIND_TRI if gi < t else KIND_SPHERE)
                skips.append(pos + 1)
                refs.append(int(gi) if gi < t else int(gi - t))
                prim_pos.append(pos)
                prim_idx.append(int(gi))
            continue
        pos = len(kinds)
        kinds.append(KIND_INTERNAL)
        skips.append(-1)  # patched below
        refs.append(-1)
        internal_pos.append(pos)
        internal_mn.append(mn[idxs].min(axis=0))
        internal_mx.append(mx[idxs].max(axis=0))
        left, right = _split_sah(idxs, cent, mn, mx)
        stack.append(("patch", pos))
        stack.append(("node", right))
        stack.append(("node", left))

    nn = len(kinds)
    rows = np.zeros((nn, ROW_WIDTH), np.float32)
    rows_i = rows.view(np.int32)
    rows_i[:, 0] = np.asarray(kinds, np.int32)
    rows_i[:, 1] = np.asarray(skips, np.int32)

    if internal_pos:
        ip = np.asarray(internal_pos, np.int64)
        rows[ip, 2:5] = np.asarray(internal_mn, np.float32)
        rows[ip, 5:8] = np.asarray(internal_mx, np.float32)
    pp = np.asarray(prim_pos, np.int64)
    pi = np.asarray(prim_idx, np.int64)
    tri_sel = pi < t
    tp, ti = pp[tri_sel], pi[tri_sel]
    rows[tp, 2:11] = tri_verts[ti].reshape(-1, 9).astype(np.float32)
    if sp:
        spp_, si = pp[~tri_sel], pi[~tri_sel] - t
        rows[spp_, 2:5] = np.asarray(sphere_center, np.float32)[si]
        rows[spp_, 5] = np.asarray(sphere_radius, np.float32)[si]
    rows_i[pp, 11] = prim_id[pi].astype(np.int32)

    entry_ref = np.asarray(refs, np.int32)
    entry_mat = np.zeros(nn, np.int32)
    entry_mat[pp] = mat_id[pi].astype(np.int32)
    return rows, entry_ref, entry_mat


def _bitcast_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def intersect_rays_bvh(
    scene,
    o: V3,
    d: V3,
    ignore_prim: jnp.ndarray,
    eps: float,
    need_attrs: bool = True,
):
    """Closest hit via stackless skip-link BVH traversal (module docstring).

    Semantics match render/intersect.py intersect_rays_soa (reference
    Scene::intersect, src/scene.cpp:433-445) extended with spheres, up to
    closest-hit ties between exactly-equal distances (resolved by DFS order
    here vs lowest-triangle-index there; measure-zero for MC rays).
    Directions must be unit length (they are throughout the integrator); the
    sphere test relies on |d| = 1.
    """
    from simple_spectral_tpu.render.intersect import INF, HitRecord, _pick_axes

    nodes = scene.bvh_nodes
    nn = scene.n_bvh_entries
    n = o.x.shape[0]

    # per-lane watertight shear constants (shared by every tri test)
    kx, ky, kz, dz = _pick_axes(d)
    inv_dz = 1.0 / jnp.where(dz == 0.0, 1.0, dz)
    sx = select3(kx, d.x, d.y, d.z) * inv_dz
    sy = select3(ky, d.x, d.y, d.z) * inv_dz
    sz = inv_dz

    # slab-test inverse directions; exact zeros replaced by a tiny value so
    # t1/t2 become huge-but-finite with the CORRECT containment semantics
    # (origin inside the slab -> unconstrained, outside -> excluded)
    def _inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < 1e-30, 1e-30, c)

    ivx, ivy, ivz = _inv(d.x), _inv(d.y), _inv(d.z)

    def body(state):
        ptr, best_dist, best_entry = state
        idx = jnp.minimum(ptr, nn - 1)
        rows = jnp.take(nodes, idx, axis=0)  # f32[N, 12], one gather/step
        kind = _bitcast_i32(rows[:, 0])
        skip = _bitcast_i32(rows[:, 1])
        prim = _bitcast_i32(rows[:, 11])

        # --- internal: AABB slab test pruned by the current best ---
        t1x = (rows[:, 2] - o.x) * ivx
        t2x = (rows[:, 5] - o.x) * ivx
        t1y = (rows[:, 3] - o.y) * ivy
        t2y = (rows[:, 6] - o.y) * ivy
        t1z = (rows[:, 4] - o.z) * ivz
        t2z = (rows[:, 7] - o.z) * ivz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        aabb_hit = (tn <= tf) & (tf >= eps) & (tn <= best_dist)

        # --- triangle: watertight test on the inlined 9 vertex floats ---
        def sheared(v0):
            rx = rows[:, 2 + 3 * v0] - o.x
            ry = rows[:, 3 + 3 * v0] - o.y
            rz = rows[:, 4 + 3 * v0] - o.z
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
        inside = ((u >= 0.0) & (v >= 0.0) & (w >= 0.0)) | (
            (u <= 0.0) & (v <= 0.0) & (w <= 0.0)
        )
        det = u + v + w
        ok_det = jnp.abs(det) > eps
        t_scaled = sz * (u * az_a + v * az_b + w * az_c)
        same_sign = jnp.signbit(det) == jnp.signbit(t_scaled)
        tri_dist = t_scaled / jnp.where(det == 0.0, 1.0, det)
        tri_ok = inside & ok_det & same_sign & (tri_dist >= eps)

        # --- sphere: nearest quadratic root >= eps (|d| = 1) ---
        ocx = o.x - rows[:, 2]
        ocy = o.y - rows[:, 3]
        ocz = o.z - rows[:, 4]
        r2 = rows[:, 5] * rows[:, 5]
        bq = ocx * d.x + ocy * d.y + ocz * d.z
        cq = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = bq * bq - cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        sph_near = -bq - sq
        sph_far = -bq + sq
        sph_dist = jnp.where(sph_near >= eps, sph_near, sph_far)
        sph_ok = (disc > 0.0) & (sph_dist >= eps)

        not_ign = prim != ignore_prim
        cand = jnp.where((kind == KIND_TRI) & tri_ok & not_ign, tri_dist, INF)
        cand = jnp.where((kind == KIND_SPHERE) & sph_ok & not_ign, sph_dist, cand)
        better = cand < best_dist
        best_dist = jnp.where(better, cand, best_dist)
        best_entry = jnp.where(better, idx, best_entry)

        nxt = jnp.where((kind == KIND_INTERNAL) & aabb_hit, ptr + 1, skip)
        ptr = jnp.where(ptr < nn, nxt, ptr)
        return ptr, best_dist, best_entry

    state = (
        jnp.zeros((n,), jnp.int32),
        jnp.full((n,), INF, jnp.float32),
        jnp.zeros((n,), jnp.int32),
    )
    ptr, best_dist, best_entry = jax.lax.while_loop(
        lambda s: jnp.any(s[0] < nn), body, state
    )

    return recover_hit_record(
        scene, nodes, scene.bvh_entry_ref, scene.bvh_entry_mat,
        best_entry, best_dist, o, d, need_attrs,
    )


def recover_hit_record(
    scene, rows_table, entry_ref, entry_mat, best_entry, best_dist,
    o: V3, d: V3, need_attrs: bool, recompute_dist: bool = False,
):
    """Winner-only attribute recovery shared by the BVH and block-cull arms.

    ``rows_table`` is any packed entry array whose rows follow the bvh row
    layout (word 0 kind, words 2..10 payload, word 11 prim id);
    ``best_entry`` indexes it per lane (miss lanes: best_dist == inf).
    Triangle ST comes from recomputing the scaled barycentrics for the
    single winning triangle -- exactly the recovery used by the Pallas
    wrapper (render/intersect.py:246-284).  ``recompute_dist``: replace the
    traversal's distance with the exact barycentric recompute -- needed by
    the cull kernel (its packed-key dist is quantized to 6 low mantissa
    bits); the BVH walk's distance is already exact and keeping it
    preserves bitwise parity with the dense sweep.
    """
    from simple_spectral_tpu.render.intersect import INF, HitRecord, _pick_axes

    hit = jnp.isfinite(best_dist)
    entry = jnp.where(hit, best_entry, 0)
    rows = jnp.take(rows_table, entry, axis=0)
    kind = _bitcast_i32(rows[:, 0])
    ref = jnp.take(entry_ref, entry)
    mat = jnp.where(hit, jnp.take(entry_mat, entry), 0)
    prim = jnp.where(hit, _bitcast_i32(rows[:, 11]), -1)
    is_tri = hit & (kind == KIND_TRI)
    tri = jnp.where(is_tri, ref, 0)
    if not need_attrs:
        zero = jnp.zeros_like(best_dist)
        return HitRecord(
            hit=hit, dist=best_dist, tri=tri, prim=prim, mat=mat,
            normal=V3(zero, zero, zero), st_s=zero, st_t=zero,
        )

    kx, ky, kz, dz = _pick_axes(d)
    inv_dz = 1.0 / jnp.where(dz == 0.0, 1.0, dz)
    sx = select3(kx, d.x, d.y, d.z) * inv_dz
    sy = select3(ky, d.x, d.y, d.z) * inv_dz
    sz = inv_dz

    tnorm = V3(
        jnp.take(scene.tri_normal[:, 0], tri),
        jnp.take(scene.tri_normal[:, 1], tri),
        jnp.take(scene.tri_normal[:, 2], tri),
    )

    def sheared_row(v0):
        rx = rows[:, 2 + 3 * v0] - o.x
        ry = rows[:, 3 + 3 * v0] - o.y
        rz = rows[:, 4 + 3 * v0] - o.z
        r_kx = select3(kx, rx, ry, rz)
        r_ky = select3(ky, rx, ry, rz)
        r_kz = select3(kz, rx, ry, rz)
        return r_kx - sx * r_kz, r_ky - sy * r_kz, r_kz

    ax_a, ay_a, az_a = sheared_row(0)
    ax_b, ay_b, az_b = sheared_row(1)
    ax_c, ay_c, az_c = sheared_row(2)
    u = ay_b * ax_c - ax_b * ay_c
    v = ay_c * ax_a - ax_c * ay_a
    w = ay_a * ax_b - ax_a * ay_b
    det = u + v + w
    inv_det = jnp.where(det != 0.0, 1.0 / jnp.where(det != 0.0, det, 1.0), 0.0)
    st = jnp.take(scene.tri_st, tri, axis=0)  # f32[N, 3, 2]
    tri_st_s = (u * st[:, 0, 0] + v * st[:, 1, 0] + w * st[:, 2, 0]) * inv_det
    tri_st_t = (u * st[:, 0, 1] + v * st[:, 1, 1] + w * st[:, 2, 1]) * inv_det
    if recompute_dist:
        # exact triangle distance recomputed from the winning row (the cull
        # kernel's packed-key dist is quantized; see docstring)
        t_scaled = sz * (u * az_a + v * az_b + w * az_c)
        tri_dist = jnp.where(
            is_tri & (det != 0.0),
            t_scaled / jnp.where(det != 0.0, det, 1.0),
            best_dist,
        )
        best_dist = jnp.where(is_tri, tri_dist, best_dist)
        if scene.n_spheres:
            # exact sphere distance: re-solve the quadratic for the winning
            # sphere and take the root nearest the quantized key distance
            # (the two roots differ by 2*sqrt(disc) >> the 2^-17 relative
            # quantization, except exactly-grazing hits where both roots
            # agree anyway) -- advisor round-4 item 1
            is_sph_r = hit & (kind == KIND_SPHERE)
            ocx = o.x - rows[:, 2]
            ocy = o.y - rows[:, 3]
            ocz = o.z - rows[:, 4]
            bq = ocx * d.x + ocy * d.y + ocz * d.z
            cq = ocx * ocx + ocy * ocy + ocz * ocz - rows[:, 5] * rows[:, 5]
            disc = bq * bq - cq
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            near, far = -bq - sq, -bq + sq
            pick_near = jnp.abs(near - best_dist) <= jnp.abs(far - best_dist)
            sph_dist = jnp.where(pick_near, near, far)
            best_dist = jnp.where(is_sph_r & (disc > 0.0), sph_dist, best_dist)

    if scene.n_spheres:
        is_sph = hit & (kind == KIND_SPHERE)
        safe_dist = jnp.where(hit, best_dist, 0.0)
        hx = o.x + safe_dist * d.x
        hy = o.y + safe_dist * d.y
        hz = o.z + safe_dist * d.z
        inv_r = 1.0 / jnp.maximum(rows[:, 5], 1e-30)
        snx = (hx - rows[:, 2]) * inv_r
        sny = (hy - rows[:, 3]) * inv_r
        snz = (hz - rows[:, 4]) * inv_r
        # sphere ST: equirectangular parameterization (extension; the
        # reference has no sphere primitive, so no convention to match)
        two_pi = 2.0 * jnp.pi
        sph_s = 0.5 + jnp.arctan2(snz, snx) / two_pi
        sph_t = 0.5 - jnp.arcsin(jnp.clip(sny, -1.0, 1.0)) / jnp.pi
        normal = V3(
            jnp.where(is_sph, snx, tnorm.x),
            jnp.where(is_sph, sny, tnorm.y),
            jnp.where(is_sph, snz, tnorm.z),
        )
        st_s = jnp.where(is_sph, sph_s, tri_st_s)
        st_t = jnp.where(is_sph, sph_t, tri_st_t)
    else:
        normal, st_s, st_t = tnorm, tri_st_s, tri_st_t

    return HitRecord(
        hit=hit, dist=jnp.where(hit, best_dist, INF), tri=tri, prim=prim,
        mat=mat, normal=normal, st_s=st_s, st_t=st_t,
    )
