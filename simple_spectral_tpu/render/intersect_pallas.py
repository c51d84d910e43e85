"""Pallas TPU kernel for the closest-hit intersection sweep.

The XLA formulation of the watertight test (render/intersect.py) is a fused
elementwise+reduce pass over the fat ``[T, N]`` grid; measured on v5e it
runs at ~half of VPU peak because the per-(triangle, lane) work includes the
axis-permuted vertex projections (~27 FMA + 18 selects per element).  This
kernel restructures that projection as an MXU matmul:

    A_alpha[vert*T + t, n] = sum_c tri_verts[t, vert, c] * p_alpha[c, n]

where ``p_alpha`` (alpha in {x, y, z}) are the *per-lane* shear coefficient
row-vectors of the Woop/Benthin/Wald watertight test (reference
src/geometry.cpp:16-56):

    p_x = e_kx - s_x e_kz,   p_y = e_ky - s_y e_kz,   p_z = e_kz

so that  r . p_x = r_kx - s_x r_kz  is exactly the sheared X coordinate of
``r = v - o`` (the subtraction of ``o . p_alpha`` happens after the matmul).
Three small matmuls ([3*T_pad, 8] x [8, BN]) replace the dominant VPU work;
the remaining epilogue (barycentrics, validity masks, distance) runs on the
VPU over VMEM-resident tiles, and the closest hit reduces to ONE int32 min
over a packed key:

    key = (bitcast_i32(dist) & ~idx_mask) | triangle_index

(monotonic in dist for positive floats; near-ties within 2^(b-23) relative
distance resolve to the lower triangle index -- the only systematic tie is a
quad's own diagonal, where both halves are coplanar and equivalent).

The kernel returns only ``best_key`` i32[N]; hit attributes are recomputed
for the single winning triangle per lane in thin jnp context (fast gathers)
by the caller -- intersect.intersect_rays_pallas.  Nothing here is
differentiated: path geometry is constant w.r.t. the material tables
(SURVEY.md section 7.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF_BITS = 0x7F800000  # bit pattern of +inf as int32


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_tris(tri_verts, tri_prim):
    """Host-side packing of the triangle soup for the kernel.

    tri_verts f32[T, 3, 3], tri_prim i32[T] ->
      v_mat  f32[3*T_pad, 8]: row (vert*T_pad + t) = vertex xyz, zero-padded
                              K to 8; padded triangles are all-zero (their
                              barycentrics vanish identically -> det == 0 ->
                              masked invalid in the epilogue).
      prim   i32[T_pad, 1]:   owning primitive, -2 on padded rows (never
                              equal to any real/ignore id).
    """
    t = tri_verts.shape[0]
    t_pad = _round_up(t, 8)
    v = jnp.zeros((3, t_pad, 8), jnp.float32)
    # vert-major rows so the kernel slices contiguous [T_pad] row blocks
    v = v.at[:, :t, :3].set(jnp.transpose(tri_verts, (1, 0, 2)))
    v_mat = v.reshape(3 * t_pad, 8)
    prim = jnp.full((t_pad, 1), -2, jnp.int32).at[:t, 0].set(tri_prim)
    return v_mat, prim


def _kernel(rays_ref, ign_ref, v_ref, prim_ref, out_ref, *, t_pad, idx_mask, eps):
    f32 = jnp.float32
    ox, oy, oz = rays_ref[0:1, :], rays_ref[1:2, :], rays_ref[2:3, :]
    dx, dy, dz = rays_ref[3:4, :], rays_ref[4:5, :], rays_ref[5:6, :]
    ign = ign_ref[0:1, :]

    # --- per-lane axis permutation + shear (reference src/geometry.cpp:16-45)
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
    inv_dz = 1.0 / d_kz
    sx = sel3(kx, dx, dy, dz) * inv_dz
    sy = sel3(ky, dx, dy, dz) * inv_dz
    sz = inv_dz

    def onehot(k, i):
        return (k == i).astype(f32)

    # shear coefficient row-vectors, each [3][1, BN]
    p = []
    for i in range(3):
        ezi = onehot(kz, i)
        p.append((onehot(kx, i) - sx * ezi, onehot(ky, i) - sy * ezi, ezi))
    zero = jnp.zeros_like(ox)
    pads = [zero] * 5

    def pmat(alpha):  # [8, BN] K-padded coefficient matrix for axis alpha
        return jnp.concatenate([p[0][alpha], p[1][alpha], p[2][alpha]] + pads, axis=0)

    def odot(alpha):  # o . p_alpha, [1, BN]
        return p[0][alpha] * ox + p[1][alpha] * oy + p[2][alpha] * oz

    v = v_ref[:]  # [3*T_pad, 8]
    # precision=HIGHEST: full-f32 MXU passes.  The default (single bf16 pass)
    # loses 16 mantissa bits of the projected vertex coordinates, which flips
    # edge/graze validity on ~0.1% of Monte-Carlo rays vs the VPU reference
    # (measured on v5e); the exact passes cost nothing at K=8.
    proj = [
        jax.lax.dot_general(
            v, pmat(a), (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
        )
        - odot(a)
        for a in range(3)
    ]  # 3 x [3*T_pad, BN]: sheared coords of (v - o) for all verts x tris

    ax_a, ax_b, ax_c = proj[0][:t_pad], proj[0][t_pad : 2 * t_pad], proj[0][2 * t_pad :]
    ay_a, ay_b, ay_c = proj[1][:t_pad], proj[1][t_pad : 2 * t_pad], proj[1][2 * t_pad :]
    az_a, az_b, az_c = proj[2][:t_pad], proj[2][t_pad : 2 * t_pad], proj[2][2 * t_pad :]

    # --- watertight epilogue (reference src/geometry.cpp:52-88), [T_pad, BN]
    u = ay_b * ax_c - ax_b * ay_c
    vv = ay_c * ax_a - ax_c * ay_a
    w = ay_a * ax_b - ax_a * ay_b
    inside = ((u >= 0.0) & (vv >= 0.0) & (w >= 0.0)) | (
        (u <= 0.0) & (vv <= 0.0) & (w <= 0.0)
    )
    det = u + vv + w
    ok_det = jnp.abs(det) > eps
    t_scaled = sz * (u * az_a + vv * az_b + w * az_c)
    same_sign = (det < 0.0) == (t_scaled < 0.0)
    dist = t_scaled / det
    # prim >= 0 explicitly kills padded rows: their three projected vertices
    # coincide, and FMA contraction of u = ay_b*ax_c - ax_b*ay_c leaves a
    # tiny rounding residual instead of an exact 0, which can push |det|
    # past eps and fabricate a hit (observed in both interpret and TPU runs).
    valid = (
        inside & ok_det & same_sign & (dist >= eps)
        & (prim_ref[:] != ign) & (prim_ref[:] >= 0)
    )
    dist = jnp.where(valid, dist, jnp.inf)

    iota_t = jax.lax.broadcasted_iota(jnp.int32, (t_pad, dist.shape[1]), 0)
    key = (pltpu.bitcast(dist, jnp.int32) & ~idx_mask) | iota_t
    out_ref[0:1, :] = jnp.min(key, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def intersect_best_key(tri_verts, tri_prim, o, d, ignore_prim, eps, interpret=False):
    """Closest-hit sweep: rays (V3 o, V3 d, i32[N] ignore) -> best_key i32[N].

    best_key < INF_BITS means hit; (best_key & idx_mask) is the winning
    triangle; bitcast(best_key & ~idx_mask) is the distance quantized to
    idx_bits low mantissa bits.  idx_mask is derivable from T alone (see
    key_idx_mask), so callers unpack without extra outputs.
    """
    n_tris = tri_verts.shape[0]
    t_pad = _round_up(n_tris, 8)
    idx_mask = key_idx_mask(n_tris)
    v_mat, prim = pack_tris(tri_verts, tri_prim)

    n = o.x.shape[0]
    block_n = 2048
    n_pad = _round_up(n, block_n)
    rays = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z])  # f32[6, N]
    if n_pad != n:
        # padded lanes get degenerate rays (d = 0 -> inv_dz = inf -> masked
        # invalid); their keys are never read back
        rays = jnp.pad(rays, ((0, 0), (0, n_pad - n)))
        ignore_prim = jnp.pad(ignore_prim, (0, n_pad - n))
    ign = ignore_prim[None, :]

    grid = (n_pad // block_n,)
    kernel = functools.partial(_kernel, t_pad=t_pad, idx_mask=idx_mask, eps=eps)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((6, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * t_pad, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rays, ign, v_mat, prim)
    return out[0, :n]


def key_idx_mask(n_tris: int) -> int:
    """Low-bit mask holding the triangle index inside a packed key."""
    return (1 << max(1, (n_tris - 1).bit_length())) - 1
