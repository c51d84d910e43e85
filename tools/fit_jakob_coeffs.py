"""Fit our own Jakob & Hanika 2019 sigmoid-polynomial coefficient cube.

The reference requires ``data/jakob-and-hanika-2019-srgb.coeff`` which is
missing from its own checkout (/root/reference/.MISSING_LARGE_BLOBS); per
SURVEY.md C18 the table must be regenerated.  This tool fits the model from
scratch -- no upstream data involved:

For every sRGB value on a (max-component, scale, x, y) cube (the
parameterization of rgb2spec_fetch, reference
src/jakob-and-hanika-2019/rgb2spec.c:77-118), find coefficients (c0, c1, c2)
such that the reflectance  S(lam) = 1/2 x / sqrt(x^2+1) + 1/2  with
x = c0 lam^2 + c1 lam + c2  reproduces the target RGB under D65 and the CIE
1931 observer.  Vectorized Gauss-Newton (vmapped 3x3 solves) with
continuation across brightness slices, in float64 on CPU.

Writes data/jakob2019-srgb-{res}.npz: scale f32[res] (z nodes) and
coeffs f32[3, res, res, res, 3] indexed [max_comp, z, y, x, coeff], with
coefficients already converted to plain nm units (matching
rgb2spec_eval_precise, rgb2spec.c:129-133).
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.spectra.colorimetry import build_color_tables
from simple_spectral_tpu.spectra.spectrum import data_path

RES = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N_GN = 32  # Gauss-Newton iterations per slice


def smoothstep(x):
    return x * x * (3.0 - 2.0 * x)


def main():
    cfg = RenderConfig(mode="mallett", observer=1931)
    t = build_color_tables(cfg)
    lam_lo, lam_hi = 380.0, 780.0

    # integration grid = observer grid (380..780 @ 5nm)
    lams = np.linspace(lam_lo, lam_hi, 81)
    obs = np.stack([o.sample_linear(lams) for o in t.host["obs"]])  # [3, K]
    d65 = t.host["d65_rad"].sample_linear(lams)  # [K]
    m_xyz2rgb = t.host["matr_xyz_to_lrgb"]  # [3,3]
    # normalize so a unit reflectance integrates to rgb == (1,1,1)
    w_xyz = (obs * d65).sum(axis=1)
    white = m_xyz2rgb @ w_xyz
    cmf = np.einsum("ij,jk->ik", m_xyz2rgb, obs * d65[None, :]) / white[:, None]
    cmf_j = jnp.asarray(cmf)  # [3, K] rgb responses per wavelength bin

    lam_n = jnp.asarray((lams - lam_lo) / (lam_hi - lam_lo))  # normalized [0,1]

    def model_rgb(c):
        # c: [..., 3] normalized-lambda coefficients
        x = (c[..., 0:1] * lam_n + c[..., 1:2]) * lam_n + c[..., 2:3]
        s = 0.5 * x / jnp.sqrt(x * x + 1.0) + 0.5  # [..., K]
        return jnp.einsum("ck,...k->...c", cmf_j, s)

    def residual(c, target):
        return model_rgb(c) - target

    @jax.jit
    def gn_iterate(c0, target):
        def body(c, _):
            r = residual(c, target)
            J = jax.vmap(jax.jacfwd(lambda cc, tt: residual(cc, tt)))(c, target)
            # Levenberg damping for stability in the saturated corners
            JtJ = jnp.einsum("nij,nik->njk", J, J)
            JtJ = JtJ + 1e-10 * jnp.eye(3)
            Jtr = jnp.einsum("nij,ni->nj", J, r)
            step = jnp.linalg.solve(JtJ, Jtr[..., None])[..., 0]
            # backtracking: halve the step while the loss does not decrease
            loss0 = jnp.sum(r * r, axis=-1)

            def try_scale(scale):
                cn = c - step * scale
                rn = residual(cn, target)
                return cn, jnp.sum(rn * rn, axis=-1)

            c1, l1 = try_scale(1.0)
            c2, l2 = try_scale(0.5)
            c3, l3 = try_scale(0.25)
            best_c = jnp.where((l1 <= l2)[:, None] & (l1 <= l3)[:, None], c1,
                               jnp.where((l2 <= l3)[:, None], c2, c3))
            best_l = jnp.minimum(jnp.minimum(l1, l2), l3)
            out = jnp.where((best_l < loss0)[:, None], best_c, c)
            return out, None

        c, _ = jax.lax.scan(body, c0, None, length=N_GN)
        return c, jnp.sqrt(jnp.sum(residual(c, target) ** 2, axis=-1))

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def reseed_from_neighbors(c, err, target, res):
        # Jacobi-style 2D continuation: texels stuck in a bad basin adopt a
        # 4-neighbor's solution as a fresh initialization when that neighbor
        # fits much better (the official generator achieves the same with a
        # sequential outward spiral; this is the data-parallel equivalent).
        cg = c.reshape(res, res, 3)
        eg = err.reshape(res, res)
        best_c, best_e = cg, eg
        for shift, axis in (((1,), 0), ((-1,), 0), ((1,), 1), ((-1,), 1)):
            nc = jnp.roll(cg, shift, axis=axis)
            ne = jnp.roll(eg, shift, axis=axis)
            take = ne < best_e
            best_c = jnp.where(take[..., None], nc, best_c)
            best_e = jnp.where(take, ne, best_e)
        return best_c.reshape(-1, 3)

    res = RES
    scale = smoothstep(smoothstep(np.linspace(0.0, 1.0, res)))
    scale[0] = 1e-4  # avoid the degenerate all-zero slice
    xy = np.linspace(0.0, 1.0, res)
    gx, gy = np.meshgrid(xy, xy, indexing="xy")  # x fastest in memory

    coeffs = np.zeros((3, res, res, res, 3), np.float64)
    t0 = time.time()
    max_err_all = 0.0
    for comp in range(3):
        # continuation: start at the brightest slice with a neutral guess,
        # then seed each darker slice from the previous solution
        c_prev = jnp.zeros((res * res, 3), jnp.float64)
        for zi in range(res - 1, -1, -1):
            z = scale[zi]
            target = np.zeros((res * res, 3))
            target[:, comp] = z
            target[:, (comp + 1) % 3] = (gx * z).reshape(-1)
            target[:, (comp + 2) % 3] = (gy * z).reshape(-1)
            tj = jnp.asarray(target)
            c_fit, err = gn_iterate(c_prev, tj)
            for _ in range(4):
                c_try = reseed_from_neighbors(c_fit, err, tj, res)
                c_new, err_new = gn_iterate(c_try, tj)
                better = err_new < err
                c_fit = jnp.where(better[:, None], c_new, c_fit)
                err = jnp.minimum(err, err_new)
            coeffs[comp, zi] = np.asarray(c_fit).reshape(res, res, 3)
            c_prev = c_fit
            max_err_all = max(max_err_all, float(err.max()))
        print(f"comp {comp} done ({time.time()-t0:.0f}s), max rgb err so far {max_err_all:.3e}")

    # convert normalized-lambda coefficients to nm units (rgb2spec.c:129-133
    # evaluates with lambda in nm)
    a, b = lam_lo, lam_hi - lam_lo
    cn0, cn1, cn2 = coeffs[..., 0], coeffs[..., 1], coeffs[..., 2]
    c0 = cn0 / b**2
    c1 = cn1 / b - 2 * a * cn0 / b**2
    c2 = cn0 * (a / b) ** 2 - cn1 * a / b + cn2
    out = np.stack([c0, c1, c2], axis=-1).astype(np.float32)

    dst = data_path(f"jakob2019-srgb-{res}.npz")
    np.savez_compressed(dst, scale=scale.astype(np.float32), coeffs=out)
    print(f"wrote {dst}; max fit rgb error {max_err_all:.3e}")


if __name__ == "__main__":
    main()
