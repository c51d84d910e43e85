"""Block-cull intersection: per-ray-block cluster culling + dense tile tests.

THE TPU-native acceleration structure, designed from the measured failure of
per-lane traversal (tools/bvh_micro_r04.json; PERF.md "Intersection"): on
this hardware a dense [T, N] sweep runs VPU-saturated at ~19 ps per
(prim, ray) test while any per-lane gather costs ~7 ns/index -- pointer
chasing can never win.  What CAN win is doing fewer dense tests: cull at the
granularity of (primitive cluster) x (ray block), where the irregular
memory access -- fetching a culled-in cluster's primitives -- is ONE
sequential DMA amortized over a whole 1024-lane block.

Three stages:

1. **Host build** (:func:`build_cluster_arrays`): the SAH partitioner cuts
   the primitive set into C clusters of <= L primitives (same binned-SAH
   splits as render/bvh.py, stopped early), packed as one DMA-able tile per
   cluster: f32[C, 1 + L, 12] -- row 0 carries the cluster AABB, rows 1..L
   the primitives in the bvh row layout (word 0 kind, words 2..10 payload,
   word 11 prim id; short clusters padded with kind=-1 rows).

2. **Cull (XLA)**: a dense [C, N] slab test (C ~ T/L, so ~1/L of the full
   sweep's cost) -> per ray-block of 1024 lanes, the list of clusters hit
   by ANY lane, front-to-back by block-min entry distance.  Pure dense VPU
   work + a [C, NB] argsort; no per-lane gathers anywhere.

3. **Test (Pallas)**: grid over ray blocks.  Each block walks its own
   cluster list (length in SMEM), double-buffer-DMAs each cluster tile
   HBM -> VMEM, and tests all L primitives against all 1024 lanes as dense
   [L, BN] VPU math -- triangles via the watertight shear test, spheres via
   the quadratic -- keeping a per-lane packed best (distance | row) key.
   A per-lane AABB pre-check prunes the best-key update (not the DMA).

Work scales with how many clusters each BLOCK touches: coherent blocks
(camera rays, shadow rays toward a small light) touch a handful; fully
incoherent blocks degrade gracefully toward the dense sweep's total work
(every cluster, but still only once per block).  Correctness does not
depend on coherence.

Closest-hit ties: the in-tile best key carries the row index in the 6 low
mantissa bits (L <= 63), so ties within 2^-17 relative distance resolve to
the lower row -- the same tie class as the Pallas best-key kernel
(render/intersect_pallas.py).  When attributes are requested, exact
distances are recovered per winner (triangles via the barycentric
recompute, spheres by re-solving the quadratic -- render/bvh.py
recover_hit_record); ``need_attrs=False`` keeps the quantized key
distance (its consumers compare prim ids only).

Early exit (round 5): the per-block cluster list is sorted by block-min
entry distance, so the walk runs as a ``while_loop`` that stops once the
next cluster's entry key exceeds every lane's current best -- a candidate
there would have bits(dist) >= bits(entry) > best_key, which can never win
under the quantized-key comparison, so the cut is EXACTLY result-
preserving (tie class included).  Lanes that miss everything keep an inf
best and correctly force the full walk for their block.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simple_spectral_tpu.render.vec import V3, select3

BLOCK_N = 1024
INF_BITS = 0x7F800000
# Cluster-tile row width: logically 12 f32 words (the bvh row layout), padded
# to 128 so the kernel's per-cluster .at[c] DMA slice is lane-aligned
# (Mosaic requires minor-dim slices in multiples of 128).  The padding costs
# DMA bytes only (~33 KB/cluster, trivial next to the [L, 1024] VPU work).
TILE_W = 128


def build_cluster_arrays(
    tri_verts: np.ndarray,
    tri_prim: np.ndarray,
    tri_mat: np.ndarray,
    sphere_center: Optional[np.ndarray] = None,
    sphere_radius: Optional[np.ndarray] = None,
    sphere_prim: Optional[np.ndarray] = None,
    sphere_mat: Optional[np.ndarray] = None,
    cluster_size: int = 63,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SAH-partitioned cluster tiles (module docstring stage 1).

    Returns (tiles f32[C, 1 + L, TILE_W], entry_ref i32[C * (1 + L)],
    entry_mat i32[C * (1 + L)]) -- the flat entry arrays parallel
    ``tiles.reshape(-1, TILE_W)`` so the winner slot indexes them directly.
    """
    from simple_spectral_tpu.render.bvh import (
        KIND_SPHERE,
        KIND_TRI,
        _split_sah,
    )

    assert 1 <= cluster_size <= 63  # row index must fit 6 packed key bits
    tri_verts = np.asarray(tri_verts, np.float64)
    t = tri_verts.shape[0]
    sp = 0 if sphere_center is None else int(np.shape(sphere_center)[0])
    p = t + sp
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

    clusters = []
    stack = [np.arange(p, dtype=np.int64)]
    while stack:
        idxs = stack.pop()
        if len(idxs) <= cluster_size:
            clusters.append(idxs)
            continue
        left, right = _split_sah(idxs, cent, mn, mx)
        stack.append(right)
        stack.append(left)

    c = len(clusters)
    l = cluster_size
    rows = np.zeros((c, 1 + l, TILE_W), np.float32)
    rows_i = rows.view(np.int32)
    ref = np.full(c * (1 + l), -1, np.int32)
    mat = np.zeros(c * (1 + l), np.int32)
    for ci, idxs in enumerate(clusters):
        rows[ci, 0, 2:5] = mn[idxs].min(axis=0)
        rows[ci, 0, 5:8] = mx[idxs].max(axis=0)
        rows_i[ci, 1:, 0] = -1  # padding kind
        for ri, gi in enumerate(idxs):
            slot = ci * (1 + l) + 1 + ri
            if gi < t:
                rows_i[ci, 1 + ri, 0] = KIND_TRI
                rows[ci, 1 + ri, 2:11] = tri_verts[gi].reshape(9)
                ref[slot] = gi
            else:
                rows_i[ci, 1 + ri, 0] = KIND_SPHERE
                rows[ci, 1 + ri, 2:5] = np.asarray(sphere_center, np.float32)[gi - t]
                rows[ci, 1 + ri, 5] = np.asarray(sphere_radius, np.float32)[gi - t]
                ref[slot] = gi - t
            rows_i[ci, 1 + ri, 11] = int(prim_id[gi])
            mat[slot] = int(mat_id[gi])
    return rows, ref, mat


# --------------------------------------------------------------------- #
# Stage 3: the Pallas block-test kernel                                  #
# --------------------------------------------------------------------- #


def _kernel(meta_hbm, rays_ref, tiles_hbm, out_ref,
            list_smem, scratch, sems, *, l_prims, eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    # fetch this block's (count, cluster ids...) row into SMEM: Mosaic
    # forbids sub-8 SMEM block slicing of inputs, so the per-block metadata
    # row travels by explicit DMA instead of a BlockSpec
    b = pl.program_id(0)
    ldma = pltpu.make_async_copy(meta_hbm.at[b], list_smem, sems.at[2])
    ldma.start()
    ldma.wait()
    count = list_smem[0, 0]
    ox, oy, oz = rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :]
    dx, dy, dz = rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :]
    ign = pltpu.bitcast(rays_ref[6:7, :], jnp.int32)

    # per-lane watertight shear constants (reference src/geometry.cpp:16-45)
    aax, aay, aaz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    x_wins = (aax > aay) & (aax > aaz)
    y_wins = (~x_wins) & (aay > aaz)
    kz = jnp.where(x_wins, 0, jnp.where(y_wins, 1, 2))
    kx = jnp.where(kz == 2, 0, kz + 1)
    ky = jnp.where(kx == 2, 0, kx + 1)

    def sel3(k, a, b, c):
        return jnp.where(k == 0, a, jnp.where(k == 1, b, c))

    d_kz = sel3(kz, dx, dy, dz)
    neg = d_kz < 0.0
    kx, ky = jnp.where(neg, ky, kx), jnp.where(neg, kx, ky)
    inv_dz = 1.0 / jnp.where(d_kz == 0.0, 1.0, d_kz)
    sx = sel3(kx, dx, dy, dz) * inv_dz
    sy = sel3(ky, dx, dy, dz) * inv_dz
    sz = inv_dz

    def inv_safe(cmp):
        return 1.0 / jnp.where(jnp.abs(cmp) < 1e-30, 1e-30, cmp)

    ivx, ivy, ivz = inv_safe(dx), inv_safe(dy), inv_safe(dz)

    def get_dma(slot, j):
        from jax.experimental.pallas import tpu as pltpu

        c = list_smem[0, 1 + j]
        return pltpu.make_async_copy(tiles_hbm.at[c], scratch.at[slot], sems.at[slot])

    @pl.when(count > 0)
    def _():
        get_dma(0, 0).start()

    init_key = jnp.full((1, rays_ref.shape[1]), INF_BITS, jnp.int32)
    init_slot = jnp.zeros((1, rays_ref.shape[1]), jnp.int32)

    def body(j, carry):
        best_key, best_slot = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < count)
        def _():
            get_dma(jax.lax.rem(j + 1, 2), j + 1).start()

        get_dma(slot, j).wait()
        c = list_smem[0, 1 + j]
        tile = scratch.at[slot]  # Ref f32[1 + L, 12]; slice per use (a full
        # load would burn a [65, 128]-padded vreg footprint)

        def amn(axis):  # aabb min component as [1, 1]
            return tile[0:1, 2 + axis: 3 + axis]

        def amx(axis):
            return tile[0:1, 5 + axis: 6 + axis]

        # per-lane AABB prune against the current best distance
        best_dist = pltpu.bitcast(best_key, f32)  # quantized prefix: <= exact
        t1x = (amn(0) - ox) * ivx
        t2x = (amx(0) - ox) * ivx
        t1y = (amn(1) - oy) * ivy
        t2y = (amx(1) - oy) * ivy
        t1z = (amn(2) - oz) * ivz
        t2z = (amx(2) - oz) * ivz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        live = (tn <= tf) & (tf >= eps) & (tn <= best_dist)  # [1, BN]

        kind = pltpu.bitcast(tile[1:, 0:1], jnp.int32)  # [L, 1]
        prim = pltpu.bitcast(tile[1:, 11:12], jnp.int32)

        # triangles: watertight shear test, [L, BN]
        def sheared(v0):
            rx = tile[1:, 2 + 3 * v0: 3 + 3 * v0] - ox
            ry = tile[1:, 3 + 3 * v0: 4 + 3 * v0] - oy
            rz = tile[1:, 4 + 3 * v0: 5 + 3 * v0] - oz
            r_kx = sel3(kx, rx, ry, rz)
            r_ky = sel3(ky, rx, ry, rz)
            r_kz = sel3(kz, rx, ry, rz)
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
        same_sign = (det < 0.0) == (t_scaled < 0.0)
        tri_dist = t_scaled / jnp.where(det == 0.0, 1.0, det)
        tri_ok = inside & ok_det & same_sign & (tri_dist >= eps)

        # spheres: nearest root >= eps (|d| = 1)
        ocx = ox - tile[1:, 2:3]
        ocy = oy - tile[1:, 3:4]
        ocz = oz - tile[1:, 4:5]
        r2 = tile[1:, 5:6] * tile[1:, 5:6]
        bq = ocx * dx + ocy * dy + ocz * dz
        cq = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = bq * bq - cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        s_near = -bq - sq
        s_far = -bq + sq
        sph_dist = jnp.where(s_near >= eps, s_near, s_far)
        sph_ok = (disc > 0.0) & (sph_dist >= eps)

        not_ign = prim != ign
        cand = jnp.where((kind == 1) & tri_ok & not_ign, tri_dist, jnp.inf)
        cand = jnp.where((kind == 2) & sph_ok & not_ign, sph_dist, cand)
        cand = jnp.where(live, cand, jnp.inf)

        iota_l = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
        key = (pltpu.bitcast(cand, jnp.int32) & ~jnp.int32(63)) | iota_l
        tile_key = jnp.min(key, axis=0, keepdims=True)  # [1, BN]

        better = tile_key < best_key
        slot_base = c * (1 + l_prims) + 1
        new_slot = slot_base + (tile_key & 63)
        best_slot = jnp.where(better, new_slot, best_slot)
        best_key = jnp.where(better, tile_key & ~jnp.int32(63), best_key)
        return best_key, best_slot

    # Early-exit walk (module docstring): clusters are front-to-back by
    # block-min entry key (meta row 1, int-comparable positive-float bits);
    # stop once the next cluster's entry exceeds every lane's best -- its
    # candidates' keys could never win the quantized comparison.
    c_cap = list_smem.shape[1] - 1

    def cond(carry):
        j, best_key, _ = carry
        nxt = list_smem[1, 1 + jnp.minimum(j, c_cap - 1)]
        return jax.lax.bitwise_and(j < count, nxt <= jnp.max(best_key))

    def wbody(carry):
        j, bk, bs = carry
        bk, bs = body(j, (bk, bs))
        return j + 1, bk, bs

    j_end, best_key, best_slot = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), init_key, init_slot)
    )

    # Drain the in-flight prefetch an early exit leaves behind (body(j)
    # starts cluster j+1's DMA before waiting j's): without this the slot
    # semaphore carries a stale count into the next grid step.
    @pl.when(jax.lax.bitwise_and(count > 0, j_end < count))
    def _():
        get_dma(jax.lax.rem(j_end, 2), j_end).wait()

    out_ref[0:1, :] = best_key
    out_ref[1:2, :] = best_slot


@functools.partial(
    jax.jit, static_argnames=("l_prims", "eps", "interpret")
)
def _cull_best(tiles, counts, lists, entries, rays, l_prims: int, eps: float,
               interpret: bool = False):
    """rays f32[8, Np]; counts i32[NB]; lists i32[NB, C]; entries f32[NB, C]
    (block-min entry distance per listed cluster, ascending -- drives the
    kernel's early exit) -> i32[2, Np] (row 0: quantized-dist key; row 1:
    winning flat slot)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = counts.shape[0]
    c_total = lists.shape[1]
    n_pad = rays.shape[1]
    # per-block metadata row (count | cluster ids...; row 1 the matching
    # entry keys as positive-float bits, int-comparable), padded to 8 rows
    # so the kernel's meta.at[b] DMA slice is sublane-aligned (Mosaic
    # requires leading-dim slices of tiled buffers in multiples of 8)
    mw = -(-(1 + c_total) // 128) * 128  # last-dim DMA slices must be
    # 128-lane aligned (Mosaic tiling), so pad the metadata width
    meta = (
        jnp.zeros((nb, 8, mw), jnp.int32)
        .at[:, 0, 0].set(counts[:, 0])
        .at[:, 0, 1:1 + c_total].set(lists)
        .at[:, 1, 1:1 + c_total].set(
            jax.lax.bitcast_convert_type(entries, jnp.int32))
    )
    kernel = functools.partial(_kernel, l_prims=l_prims, eps=eps)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, n_pad), jnp.int32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # meta rows, DMA'd to SMEM
            pl.BlockSpec((8, BLOCK_N), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # tiles stay in HBM
        ],
        out_specs=pl.BlockSpec((2, BLOCK_N), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((8, -(-(1 + c_total) // 128) * 128), jnp.int32),
            pltpu.VMEM((2, tiles.shape[1], tiles.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(meta, rays, tiles)
    return out


def _part1by2(x):
    """Spread 5 bits of x to every third bit (Morton interleave helper)."""
    x = (x | (x << 8)) & 0x0300F
    x = (x | (x << 4)) & 0x030C3
    x = (x | (x << 2)) & 0x09249
    return x


def _cull_sorted(scene, o, d, ignore_prim, eps, need_attrs, interpret):
    """Sort lanes by (origin Morton cell, direction octant), run the cull on
    the permuted rays, un-permute the HitRecord (see intersect_rays_cull)."""
    tiles = scene.cull_tiles
    mn = jnp.min(tiles[:, 0, 2:5], axis=0)
    mx = jnp.max(tiles[:, 0, 5:8], axis=0)
    scale = 31.0 / jnp.maximum(mx - mn, 1e-6)

    def q(c, axis):
        return jnp.clip(((c - mn[axis]) * scale[axis]).astype(jnp.int32), 0, 31)

    morton = (
        (_part1by2(q(o.x, 0)) << 2)
        | (_part1by2(q(o.y, 1)) << 1)
        | _part1by2(q(o.z, 2))
    )
    octant = (
        ((d.x < 0).astype(jnp.int32) << 2)
        | ((d.y < 0).astype(jnp.int32) << 1)
        | (d.z < 0).astype(jnp.int32)
    )
    order = jnp.argsort((morton << 3) | octant).astype(jnp.int32)
    op = V3(o.x[order], o.y[order], o.z[order])
    dp = V3(d.x[order], d.y[order], d.z[order])
    rec = intersect_rays_cull(
        scene, op, dp, ignore_prim[order], eps, need_attrs,
        interpret=interpret, sort_rays=False,
    )
    n = o.x.shape[0]
    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return jax.tree.map(lambda a: a[inv], rec)


def intersect_rays_cull(
    scene,
    o: V3,
    d: V3,
    ignore_prim: jnp.ndarray,
    eps: float,
    need_attrs: bool = True,
    interpret: Optional[bool] = None,
    sort_rays: Optional[bool] = None,
):
    """Closest hit via block culling (module docstring).  Semantics match
    the dense sweep up to the packed-key tie class.

    ``interpret=None`` auto-selects the Pallas interpreter off-TPU (the
    virtual-CPU test mesh), compiled Mosaic on TPU (incl. the axon-tunneled
    backend, whose platform name is not 'tpu' -- detect by device kind).

    ``sort_rays``: reorder lanes by a spatial coherence key (origin Morton
    cell, then direction octant) before blocking, and un-permute the
    results -- restores block coherence for incoherent bounce/shadow sweeps
    so each block's cluster list stays short.  Costs ~16 1-D permutation
    gathers (~30 ms at 2^18 lanes); ``None`` enables it once the cluster
    count is large enough for the cull savings to dominate (C >= 192)."""
    if interpret is None:
        d0 = jax.devices()[0]
        interpret = not ("TPU" in str(d0).upper() or d0.platform == "tpu")
    if sort_rays is None:
        sort_rays = scene.cull_tiles.shape[0] >= 192
    if sort_rays:
        return _cull_sorted(scene, o, d, ignore_prim, eps, need_attrs, interpret)
    from simple_spectral_tpu.render.bvh import recover_hit_record

    tiles = scene.cull_tiles  # f32[C, 1+L, 12]
    c_total = tiles.shape[0]
    l_prims = tiles.shape[1] - 1
    n = o.x.shape[0]
    n_pad = -(-n // BLOCK_N) * BLOCK_N

    def pad(x, fill):
        return jnp.pad(x, (0, n_pad - n), constant_values=fill) if n_pad != n else x

    # padded lanes: origin far outside every AABB pointing away -> all miss
    ox = pad(o.x, 1e9)
    oy = pad(o.y, 1e9)
    oz = pad(o.z, 1e9)
    dx = pad(d.x, 1.0)
    dy = pad(d.y, 0.0)
    dz = pad(d.z, 0.0)
    ign = pad(ignore_prim, -1)

    # ---- stage 2: dense [C, N] cull + per-block front-to-back lists ----
    c_mn = tiles[:, 0, 2:5]  # [C, 3]
    c_mx = tiles[:, 0, 5:8]

    def inv_safe(cmp):
        return 1.0 / jnp.where(jnp.abs(cmp) < 1e-30, 1e-30, cmp)

    ivx, ivy, ivz = inv_safe(dx), inv_safe(dy), inv_safe(dz)

    def slab(axis, ov, iv):
        t1 = (c_mn[:, axis][:, None] - ov[None, :]) * iv[None, :]
        t2 = (c_mx[:, axis][:, None] - ov[None, :]) * iv[None, :]
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    n1x, f1x = slab(0, ox, ivx)
    n1y, f1y = slab(1, oy, ivy)
    n1z, f1z = slab(2, oz, ivz)
    tn = jnp.maximum(jnp.maximum(n1x, n1y), n1z)
    tf = jnp.minimum(jnp.minimum(f1x, f1y), f1z)
    hit_c = (tn <= tf) & (tf >= eps)  # [C, Np]
    entry = jnp.where(hit_c, jnp.maximum(tn, 0.0), jnp.inf)

    nb = n_pad // BLOCK_N
    hit_b = hit_c.reshape(c_total, nb, BLOCK_N).any(axis=2)  # [C, NB]
    key_b = entry.reshape(c_total, nb, BLOCK_N).min(axis=2)  # [C, NB]
    key_b = jnp.where(hit_b, key_b, jnp.inf)
    counts = hit_b.sum(axis=0).astype(jnp.int32)[:, None]  # [NB, 1]
    order = jnp.argsort(key_b, axis=0).astype(jnp.int32)  # [C, NB] near-first
    lists = order.T  # [NB, C]
    # sorted entry keys per listed cluster: the kernel's early-exit bound
    # (inf where unlisted; inf bitcasts to INF_BITS, still int-comparable)
    entries = jnp.take_along_axis(key_b, order, axis=0).T  # [NB, C]

    rays = jnp.stack([
        ox, oy, oz, dx, dy, dz,
        jax.lax.bitcast_convert_type(ign, jnp.float32),
        jnp.zeros_like(ox),
    ])  # f32[8, Np]

    out = _cull_best(tiles, counts, lists, entries, rays, l_prims, eps,
                     interpret=interpret)
    best_key = out[0, :n]
    best_slot = out[1, :n]
    best_dist = jax.lax.bitcast_convert_type(best_key, jnp.float32)
    best_dist = jnp.where(best_key < INF_BITS, best_dist, jnp.inf)

    return recover_hit_record(
        scene, tiles.reshape(-1, TILE_W), scene.cull_entry_ref,
        scene.cull_entry_mat, best_slot, best_dist, o, d, need_attrs,
        recompute_dist=True,
    )
