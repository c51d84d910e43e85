"""Jakob & Hanika 2019 sigmoid-polynomial spectral upsampling ("jakob" mode).

Runtime re-implementation of the rgb2spec model (reference
src/jakob-and-hanika-2019/rgb2spec.{h,c}): a max-component-parameterized
coefficient cube fetch (trilinear interpolation over a non-uniform brightness
axis, rgb2spec.c:77-118) followed by the sigmoid-polynomial evaluation
S(lam) = 1/2 x / sqrt(x^2+1) + 1/2 with x = c0 lam^2 + c1 lam + c2
(rgb2spec_eval_precise, rgb2spec.c:129-133) -- three FMAs and an rsqrt per
wavelength, pure VPU work.

The coefficient table itself is OUR OWN fit (tools/fit_jakob_coeffs.py): the
reference's ``.coeff`` blob is missing from its checkout
(/root/reference/.MISSING_LARGE_BLOBS), so the cube is regenerated from
scratch against this package's D65/CIE-1931 colorimetry (max RGB round-trip
error of the fit ~4e-4).

Deviation: rgb2spec_fetch asserts rgb in [0,1] and divides by the max
component; pure black (z = 0) is undefined behavior in C.  We clamp inputs
to [0,1] and return an all-zero reflectance for z = 0.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.spectra.spectrum import data_path, hero_lams_soa

DEFAULT_RES = 64


def load_jakob_tables(dtype=jnp.float32, res: int = DEFAULT_RES) -> dict:
    """Load the fitted coefficient cube (see tools/fit_jakob_coeffs.py)."""
    z = np.load(data_path(f"jakob2019-srgb-{res}.npz"))
    coeffs = z["coeffs"]  # f32[3, res, res, res, 3] = [comp, z, y, x, coeff]
    return {
        "scale": jnp.asarray(z["scale"], dtype),  # f32[res], monotonic z nodes
        # flattened for lane-vector gathers: [3 * res^3, 3]
        "coeffs": jnp.asarray(coeffs.reshape(-1, 3), dtype),
        "res": int(coeffs.shape[1]),
    }


def rgb2spec_fetch_soa(jak: dict, r, g, b):
    """Per-lane coefficient fetch (reference rgb2spec.c:77-118).

    r/g/b: f32[N] in [0,1] -> (c0, c1, c2) f32[N] each, nm units.
    """
    res = jak["res"]
    scale_nodes = jak["scale"]
    r = jnp.clip(r, 0.0, 1.0)
    g = jnp.clip(g, 0.0, 1.0)
    b = jnp.clip(b, 0.0, 1.0)

    # max component, with the C loop's >=/last-wins tie behavior
    i = jnp.where(g >= r, 1, 0)
    zi_max = jnp.where(i == 1, g, r)
    i = jnp.where(b >= zi_max, 2, i)

    z = jnp.maximum(jnp.maximum(r, g), b)
    ok = z > 0.0
    inv_z = jnp.where(ok, (res - 1) / jnp.where(ok, z, 1.0), 0.0)

    def comp(k):  # rgb[(i+k)%3]
        sel = (i + k) % 3
        return jnp.where(sel == 0, r, jnp.where(sel == 1, g, b))

    x = comp(1) * inv_z
    y = comp(2) * inv_z

    xi = jnp.minimum(x.astype(jnp.int32), res - 2)
    yi = jnp.minimum(y.astype(jnp.int32), res - 2)
    # find_interval on the non-uniform scale nodes (rgb2spec.c:55-72)
    zi = jnp.clip(jnp.searchsorted(scale_nodes, z, side="left") - 1, 0, res - 2)
    zi = zi.astype(jnp.int32)

    x1 = x - xi.astype(jnp.float32)
    x0 = 1.0 - x1
    y1 = y - yi.astype(jnp.float32)
    y0 = 1.0 - y1
    s_lo = jnp.take(scale_nodes, zi, axis=0)
    s_hi = jnp.take(scale_nodes, zi + 1, axis=0)
    z1 = (z - s_lo) / (s_hi - s_lo)
    z0 = 1.0 - z1

    base = ((i * res + zi) * res + yi) * res + xi  # row index into [3res^3, 3]
    dz = res * res
    dy = res
    table = jak["coeffs"]

    def corner(off):
        rows = jnp.take(table, base + off, axis=0)  # f32[N, 3]
        return rows

    c000 = corner(0)
    c001 = corner(1)
    c010 = corner(dy)
    c011 = corner(dy + 1)
    c100 = corner(dz)
    c101 = corner(dz + 1)
    c110 = corner(dz + dy)
    c111 = corner(dz + dy + 1)
    w_x0, w_x1 = x0[:, None], x1[:, None]
    w_y0, w_y1 = y0[:, None], y1[:, None]
    w_z0, w_z1 = z0[:, None], z1[:, None]
    out = (
        ((c000 * w_x0 + c001 * w_x1) * w_y0 + (c010 * w_x0 + c011 * w_x1) * w_y1) * w_z0
        + ((c100 * w_x0 + c101 * w_x1) * w_y0 + (c110 * w_x0 + c111 * w_x1) * w_y1) * w_z1
    )  # f32[N, 3]
    # z == 0: all-zero reflectance (see module docstring); force the sigmoid
    # argument to a large negative constant.
    c0 = jnp.where(ok, out[:, 0], 0.0)
    c1 = jnp.where(ok, out[:, 1], 0.0)
    c2 = jnp.where(ok, out[:, 2], -1e6)
    return c0, c1, c2


# ---------------------------------------------------------------------- #
# q32 texel format: the three sigmoid-polynomial coefficients packed into #
# ONE u32 per texel (config.texel_format="u32").                          #
# ---------------------------------------------------------------------- #
#
# Why: the per-bounce texel fetch is gather-engine bound on TPU (~7-9 ns
# per 1-D u32 index vs ~11-17 ns for f32[T,3] rows, in and out of context
# -- tools/pack_micro_r04.json, tools/ctx_gather_r04.json), and at f32
# fidelity it was the jakob config's dominant cost (PERF.md round 4).
#
# Encoding.  The nm-unit coefficients span ~5 orders of magnitude, so they
# are first rebased to t = (lam - LC) / LH with the full two-observer range
# [380, 830] mapped near [-1, 1]:
#   x = a0 t^2 + a1 t + a2,   a0 = c0 LH^2,  a1 = (2 c0 LC + c1) LH,
#                             a2 = c0 LC^2 + c1 LC + c2.
# Each a_i is then asinh-companded (u = asinh(a / sigma)) and quantized to
# 10/11/11-bit fixed point over the texture's own u-range: companding puts
# resolution where |x| is small -- exactly where the sigmoid's slope (and
# hence the reflectance error) is largest -- and starves only the saturated
# tails where d(refl)/dx ~ (x^2+1)^{-3/2} vanishes.  Measured on the
# shipped 512^2 texture (tools/texel_q32_check.py): mean |refl err|
# 5.9e-4, per-texel XYZ err mean 6.8e-4, and 16x16-block-mean Y error
# <= 1.6e-4 -- ~25x inside the reference-parity tolerance of the converged
# renders (tests/artifacts/parity_stats.json).
#
# The z=0 black texel (reference rgb2spec.c divides by zero there; our
# fetch returns c2=-1e6, module docstring) is a reserved code: a2-field
# 0x7FF means "black", decoded as reflectance 0.
JAKOB_Q32_LC = 605.0
JAKOB_Q32_LH = 225.0
_Q32_BITS = (10, 11, 11)
_Q32_SIGMA = (4.0, 4.0, 1.0)
_Q32_BLACK = (1 << 11) - 1  # reserved a2 code


def jakob_q32_pack(c0, c1, c2):
    """Host-side pack: nm-unit coefficient arrays (numpy, [T]) ->
    (words u32[T], meta f32[9] = (lo, step, sigma) per coefficient)."""
    c0 = np.asarray(c0, np.float64)
    c1 = np.asarray(c1, np.float64)
    c2 = np.asarray(c2, np.float64)
    black = c2 < -1e5
    lc, lh = JAKOB_Q32_LC, JAKOB_Q32_LH
    a_all = (
        c0 * lh * lh,
        (2.0 * c0 * lc + c1) * lh,
        c0 * lc * lc + c1 * lc + c2,
    )
    qs, meta = [], []
    for k, (a, bits, sig) in enumerate(zip(a_all, _Q32_BITS, _Q32_SIGMA)):
        reserve = 1 if k == 2 else 0
        u = np.arcsinh(np.where(black, 0.0, a) / sig)
        sel = u[~black]
        lo = float(sel.min()) if sel.size else 0.0
        hi = float(sel.max()) if sel.size else 1.0
        n = (1 << bits) - 1 - reserve
        du = (hi - lo) / n if hi > lo else 1.0
        q = np.clip(np.round((u - lo) / du), 0, n).astype(np.uint32)
        qs.append(q)
        meta += [lo, du, sig]
    q0, q1, q2 = qs
    q2 = np.where(black, np.uint32(_Q32_BLACK), q2)
    words = (q0 << np.uint32(22)) | (q1 << np.uint32(11)) | q2
    return words.astype(np.uint32), np.asarray(meta, np.float32)


def jakob_q32_eval_soa(words, meta, lam0, n_wavelengths: int, lambda_step: float):
    """Device-side decode + sigmoid evaluation: words u32[N], meta f32[9],
    lam0 f32[N] -> reflectance f32[S, N].  Three sinh + per-wavelength
    3-FMA/rsqrt -- pure fused VPU work hidden behind the texel gather."""
    import jax

    words = words.astype(jnp.uint32)
    q0 = (words >> 22) & 0x3FF
    q1 = (words >> 11) & 0x7FF
    q2 = words & 0x7FF
    black = q2 == _Q32_BLACK

    def deq(q, o):
        u = meta[o] + q.astype(jnp.float32) * meta[o + 1]
        return meta[o + 2] * jnp.sinh(u)

    a0, a1, a2 = deq(q0, 0), deq(q1, 3), deq(q2, 6)
    inv_lh = 1.0 / JAKOB_Q32_LH
    outs = []
    for s in range(n_wavelengths):
        t = (lam0 + (s * lambda_step) - JAKOB_Q32_LC) * inv_lh
        x = (a0 * t + a1) * t + a2
        refl = 0.5 * x * jax.lax.rsqrt(x * x + 1.0) + 0.5
        outs.append(jnp.where(black, 0.0, refl))
    return jnp.stack(outs)


def rgb2spec_eval_soa(c0, c1, c2, lams):
    """Sigmoid-polynomial evaluation (rgb2spec_eval_precise,
    rgb2spec.c:129-133).  c*: f32[N]; lams: f32[S, N] -> f32[S, N]."""
    x = (c0[None, :] * lams + c1[None, :]) * lams + c2[None, :]
    y = jax_rsqrt(x * x + 1.0)
    return 0.5 * x * y + 0.5


def jax_rsqrt(v):
    import jax

    return jax.lax.rsqrt(v)


def lrgb_to_specrefl_jakob_soa(tables, cfg: RenderConfig, r, g, b, lam0):
    """lRGB -> hero reflectance (reference src/util/color.cpp:202-232: fetch
    then per-wavelength precise eval).  -> f32[S, N]."""
    c0, c1, c2 = rgb2spec_fetch_soa(tables.jakob, r, g, b)
    lams = hero_lams_soa(lam0, cfg.n_wavelengths, cfg.lambda_step)
    return rgb2spec_eval_soa(c0, c1, c2, lams)


def lrgb_to_specrefl_jakob(tables, lrgb, lambda_0, n_wavelengths: int, lambda_step: float):
    """Row-layout convenience wrapper: lrgb f32[...,3], lambda_0 f32[...]
    -> f32[..., S]."""
    import types

    shape = lambda_0.shape
    cfg = types.SimpleNamespace(n_wavelengths=n_wavelengths, lambda_step=lambda_step)
    out = lrgb_to_specrefl_jakob_soa(
        tables,
        cfg,
        lrgb[..., 0].reshape(-1),
        lrgb[..., 1].reshape(-1),
        lrgb[..., 2].reshape(-1),
        lambda_0.reshape(-1),
    )
    return jnp.moveaxis(out, 0, -1).reshape(shape + (n_wavelengths,))
