"""Round-5 stretch spike (VERDICT item 8): would a fused-bounce Pallas
megakernel beat the XLA pipeline?

SURVEY section 7.6(b) named "fused bounce step (intersect+shade+NEE)" as a
candidate Pallas kernel.  Rounds 3-4 already measured the pieces: the
standalone Pallas intersect loses to the XLA dense sweep at cornell scale
(287 vs 826 Mrays/s), and the gathers that dominate the textured configs
cannot be issued from Mosaic at all (tools/pallas_gather_r05.json).  This
spike closes the remaining question -- does fusing a WHOLE bounce's
gather-free geometry math into one kernel beat XLA's auto-fusion of the
same ops? -- by implementing one identical bounce step twice:

    closest-hit over the 38 cornell triangles (watertight shear test)
  + area-sampled NEE toward the quad light + shadow closest-hit
  + cosine-hemisphere BSDF direction around the hit normal

once as straight jnp (XLA fuses it as it does the real integrator's
phase 1) and once as a single Pallas kernel over 1024-lane blocks with the
scene resident in VMEM.  Both consume identical precomputed uniforms, so
the outputs must agree bitwise-class and the comparison isolates pure
fusion/scheduling.  (NEE here is area sampling, not the integrator's Arvo
solid-angle sampler -- same memory behavior, fewer transcendentals, fair
to both sides.)

Usage: python tools/bench_megakernel.py [out.json]
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.tpu_bench import measure_rtt, timeit_chained

N = 262144
BN = 1024
EPS = 1e-3


def scene_rows():
    """Cornell triangles packed as f32[40, 128] rows (cull-tile layout:
    words 2..10 = verts, word 11 = prim id bits; rows 38/39 padding)."""
    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    cfg = RenderConfig(scene="cornell", mode="rgb", width=64, height=64)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    t = np.asarray(scene.tri_verts)  # [T, 3, 3]
    n_t = t.shape[0]
    rows = np.zeros((40, 128), np.float32)
    rows_i = rows.view(np.int32)
    rows[:n_t, 2:11] = t.reshape(n_t, 9)
    rows_i[:n_t, 0] = 1
    rows_i[:n_t, 11] = np.asarray(scene.tri_prim)
    rows_i[n_t:, 0] = -1
    nrm = np.asarray(scene.tri_normal)
    rows[:n_t, 12:15] = nrm
    # light quad: first light prim's two triangles' vertices -> rows 16.. of
    # a separate light row block [8, 128]
    lt = np.asarray(scene.light_tris)[0]
    lv = t[lt[0]]  # [3, 3] first light triangle
    lv2 = t[lt[1]]
    light = np.zeros((8, 128), np.float32)
    light[0, :3] = lv[0]
    light[0, 3:6] = lv[1] - lv[0]   # edge u
    light[0, 6:9] = lv2[2] - lv[0]  # edge v (quad spanned by tri0 v0 + e_u + e_v)
    light_prim = int(np.asarray(scene.light_prims)[0])
    return rows, light, light_prim, scene, cfg


def _bounce_jnp(rows, light, light_prim, o, d, ign, u):
    """The spike's bounce step in straight jnp.  o/d: f32[3, N]; u f32[4, N].
    Returns f32[8, N] (dist, prim_bits, shad_prim_bits, wi, n_dot_l, pad)."""

    def closest(ox, oy, oz, dx, dy, dz, ign_i):
        # watertight shear sweep over the 38 rows, [T, N]
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

        def sheared(v0):
            rx = rows[:, 2 + 3 * v0: 3 + 3 * v0] - ox
            ry = rows[:, 3 + 3 * v0: 4 + 3 * v0] - oy
            rz = rows[:, 4 + 3 * v0: 5 + 3 * v0] - oz
            r_kx = sel3(kx, rx, ry, rz)
            r_ky = sel3(ky, rx, ry, rz)
            r_kz = sel3(kz, rx, ry, rz)
            return r_kx - sx * r_kz, r_ky - sy * r_kz, r_kz

        ax_a, ay_a, az_a = sheared(0)
        ax_b, ay_b, az_b = sheared(1)
        ax_c, ay_c, az_c = sheared(2)
        uu = ay_b * ax_c - ax_b * ay_c
        vv = ay_c * ax_a - ax_c * ay_a
        ww = ay_a * ax_b - ax_a * ay_b
        inside = ((uu >= 0.0) & (vv >= 0.0) & (ww >= 0.0)) | (
            (uu <= 0.0) & (vv <= 0.0) & (ww <= 0.0))
        det = uu + vv + ww
        ok_det = jnp.abs(det) > EPS
        t_scaled = inv_dz * (uu * az_a + vv * az_b + ww * az_c)
        same_sign = (det < 0.0) == (t_scaled < 0.0)
        dist = t_scaled / jnp.where(det == 0.0, 1.0, det)
        tri_kind = rows[:, 0:1]
        prim = rows[:, 11:12]
        ok = (
            inside & ok_det & same_sign & (dist >= EPS)
            & (tri_kind == 1.0)
            # prim-id exclusion compares the raw f32-bit pattern rows
            & (prim != ign_i)
        )
        cand = jnp.where(ok, dist, jnp.inf)
        iota = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
        key = (cand.view(jnp.int32) & ~jnp.int32(63)) | iota
        win = jnp.min(key, axis=0, keepdims=True)
        wrow = win & 63
        wdist = jnp.where(win < 0x7F800000,
                          jax.lax.bitcast_convert_type(win & ~jnp.int32(63),
                                                       jnp.float32), jnp.inf)
        return wdist, wrow

    ox, oy, oz = o[0:1], o[1:2], o[2:3]
    dx, dy, dz = d[0:1], d[1:2], d[2:3]
    dist, wrow = closest(ox, oy, oz, dx, dy, dz, ign)
    hit = jnp.isfinite(dist)
    sd = jnp.where(hit, dist, 0.0)
    hx, hy, hz = ox + sd * dx, oy + sd * dy, oz + sd * dz

    # winner normal + prim: 38-term masked sum
    nx = jnp.zeros_like(dist)
    ny = jnp.zeros_like(dist)
    nz = jnp.zeros_like(dist)
    wprim = jnp.zeros_like(dist)
    for r in range(38):
        m = wrow == r
        nx = jnp.where(m, rows[r:r + 1, 12:13], nx)
        ny = jnp.where(m, rows[r:r + 1, 13:14], ny)
        nz = jnp.where(m, rows[r:r + 1, 14:15], nz)
        wprim = jnp.where(m, rows[r:r + 1, 11:12], wprim)

    # area-sampled point on the light quad ([1,1] slices broadcast: Mosaic
    # has no scalar extraction from vectors)
    def lw(j):
        return light[0:1, j:j + 1]

    lx = lw(0) + u[0:1] * lw(3) + u[1:2] * lw(6)
    ly = lw(1) + u[0:1] * lw(4) + u[1:2] * lw(7)
    lz = lw(2) + u[0:1] * lw(5) + u[1:2] * lw(8)
    sx_, sy_, sz_ = lx - hx, ly - hy, lz - hz
    sl = jax.lax.rsqrt(sx_ * sx_ + sy_ * sy_ + sz_ * sz_ + 1e-30)
    sx_, sy_, sz_ = sx_ * sl, sy_ * sl, sz_ * sl
    sdist, srow = closest(hx, hy, hz, sx_, sy_, sz_, wprim)
    sprim = jnp.zeros_like(dist)
    for r in range(38):
        sprim = jnp.where(srow == r, rows[r:r + 1, 11:12], sprim)

    # cosine-hemisphere around the normal (Duff ONB)
    ang = u[2:3] * (2.0 * np.pi)
    r2 = u[3:4]
    rad = jnp.sqrt(r2)
    yy = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    bx = (1.0 + sign * nx * nx * a, sign * b, -sign * nx)
    bz = (b, sign + ny * ny * a, -ny)
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    wix = rad * ca * bx[0] + yy * nx + rad * sa * bz[0]
    wiy = rad * ca * bx[1] + yy * ny + rad * sa * bz[1]
    wiz = rad * ca * bx[2] + yy * nz + rad * sa * bz[2]
    ndl = wix * nx + wiy * ny + wiz * nz
    return jnp.concatenate([dist, wprim, sprim, wix, wiy, wiz, ndl,
                            jnp.zeros_like(dist)], axis=0)


def _kernel(rows_ref, light_ref, rays_ref, u_ref, out_ref):
    o = rays_ref[0:3, :]
    d = rays_ref[3:6, :]
    ign = rays_ref[6:7, :]
    out_ref[:, :] = _bounce_jnp(rows_ref[:], light_ref[:], 0,
                                o, d, ign, u_ref[:])


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rows_np, light_np, light_prim, scene, cfg = scene_rows()
    rows = jnp.asarray(rows_np)
    light = jnp.asarray(light_np)
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)

    key = jax.random.PRNGKey(0)
    from simple_spectral_tpu.render.integrator import camera_rays_soa

    px = jnp.arange(N, dtype=jnp.int32) % (cfg.width * cfg.height)
    o, d = camera_rays_soa(scene, cfg, key, px % cfg.width, px // cfg.width)
    rays = jnp.stack([o.x, o.y, o.z, d.x, d.y, d.z,
                      jnp.full((N,), -1.0), jnp.zeros((N,))])
    u = jax.random.uniform(jax.random.fold_in(key, 1), (4, N))

    results = {"device": str(jax.devices()[0]), "lanes": N, "results": []}

    @jax.jit
    def xla_step(tok):
        r2 = rays.at[0].add(tok * 1e-30)
        out = _bounce_jnp(rows, light, light_prim, r2[0:3], r2[3:6],
                          r2[6:7], u)
        return (out,)

    @jax.jit
    def pallas_step(tok):
        r2 = rays.at[0].add(tok * 1e-30)
        out = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((8, N), jnp.float32),
            grid=(N // BN,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # rows (whole)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # light
                pl.BlockSpec((8, BN), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, BN), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, BN), lambda b: (0, b),
                                   memory_space=pltpu.VMEM),
        )(rows, light, r2, u.reshape(4, N))
        return (out,)

    # correctness first: the two implementations run identical math
    a = np.asarray(xla_step(jnp.float32(0.0))[0])
    try:
        b = np.asarray(pallas_step(jnp.float32(0.0))[0])
        agree = {
            "dist_max_dev": float(np.nanmax(np.abs(
                np.where(np.isfinite(a[0]), a[0], 0)
                - np.where(np.isfinite(b[0]), b[0], 0)))),
            "prim_mismatch": int((a[1] != b[1]).sum()),
            "wi_max_dev": float(np.abs(a[3:6] - b[3:6]).max()),
        }
        results["agreement"] = agree
        print("agreement:", agree, flush=True)
    except Exception as e:  # noqa: BLE001
        results["pallas_error"] = repr(e)[:400]
        print("PALLAS FAILED:", repr(e)[:200], flush=True)
        b = None

    for label, fn in (("xla fused bounce", xla_step),
                      ("pallas megakernel bounce", pallas_step)):
        if b is None and "pallas" in label:
            continue

        def step(state, i, fn=fn):
            tok = jnp.ravel(state[0])[0] * 0.0
            return fn(tok)

        s0 = step((jnp.zeros((8, N)),), 0)
        dt = timeit_chained(label, step, s0, K=24, rtt=rtt, quiet=True)
        results["results"].append(
            {"label": label, "ms": round(dt * 1e3, 3),
             "mrays_s_2sweeps": round(2 * N / dt / 1e6, 1)})
        print(f"{label}: {dt*1e3:.3f} ms", flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
