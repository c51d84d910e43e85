"""Colorimetry: CIE tables, D65, RGB<->XYZ matrices, conversions.

TPU-native equivalent of the reference's ``Color`` module (reference
src/util/color.{hpp,cpp}).  ``Color::init`` (reference src/util/color.cpp:72-155)
becomes :func:`build_color_tables`, a host-side (numpy, float64) computation
producing a :class:`ColorTables` of device constants; every hot-path
conversion is a pure ``jnp`` function over those constants.

Primary correctness oracle: the lRGB -> spectrum -> XYZ -> lRGB round trip
must be the identity to within ~1.85e-5 in float32 (reference
src/main.cpp:242-245 documents max error 1.851469e-5 over all 24-bit colors).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig, MODE_MALLETT, MODE_MENG, MODE_JAKOB
from simple_spectral_tpu.spectra.spectrum import (
    Spectrum,
    load_spectral_csv,
    sample_linear,
    hero_wavelengths,
)

# Physical constants (reference src/stdafx.hpp:192-210).
K_B = 1.38064852e-23  # Boltzmann (J/K)
H = 6.62607015e-34  # Planck (J*s)
C = 299_792_458.0  # speed of light (m/s)

# BT.709 primaries (reference src/util/color.cpp:150).
BT709_XY = np.array([[0.64, 0.33], [0.30, 0.60], [0.15, 0.06]], dtype=np.float64)

_OBS_FILES = {
    1931: ("cie1931-xyzbar-380+5+780.csv", 380.0, 780.0),
    2006: ("cie2006-xyzbar-390+1+830.csv", 390.0, 830.0),
}
_BASIS_FILES = {
    1931: ("cie1931-basis-bt709-380+5+780.csv", 380.0, 780.0),
    2006: ("cie2006-basis-bt709-390+1+780.csv", 390.0, 780.0),
}


def planck(lambda_nm: float, temp_k: float) -> float:
    """Planck's law, spectral radiance in W*sr^-1*m^-2*nm^-1 (reference
    src/util/color.cpp:50-66)."""
    lam_m = lambda_nm * 1.0e-9
    c_1l = 2.0 * H * C * C
    c_2 = H * C / K_B
    value = c_1l / (lam_m**5 * (np.exp(c_2 / (lam_m * temp_k)) - 1.0))
    return value * 1.0e-9


def calc_matr_rgb_to_xyz(xy: np.ndarray, xyz_w: np.ndarray) -> np.ndarray:
    """RGB->XYZ matrix from primaries' chromaticities and whitepoint, a la
    Lindbloom (reference src/util/color.cpp:26-46)."""
    x, y = xy[:, 0], xy[:, 1]
    big_x = x / y
    big_y = np.ones(3)
    big_z = (1.0 - x - y) / y
    rows = np.stack([big_x, big_y, big_z])  # rows X_rgb, Y_rgb, Z_rgb
    s = np.linalg.solve(rows, xyz_w)
    return rows * s[None, :]


@dataclasses.dataclass(frozen=True)
class ColorTables:
    """Device constants for a given (observer, mode) configuration.

    Equivalent of ``Color::_Data`` (reference src/util/color.hpp:22-69), as
    immutable jnp arrays replicated to every chip.
    """

    # CIE observer x/y/z-bar on a shared uniform grid: f32[3, K].
    obs_values: jnp.ndarray
    obs_low: float
    obs_inv_step: float

    # D65 rescaled to spectral radiance via Planck (color.cpp:97-120).
    d65_values: jnp.ndarray  # f32[Kd]
    d65_low: float
    d65_inv_step: float
    d65_rad_xyz: jnp.ndarray  # f32[3]

    # BT.709 <-> XYZ (color.cpp:147-154).
    matr_lrgb_to_xyz: jnp.ndarray  # f32[3,3]
    matr_xyz_to_lrgb: jnp.ndarray  # f32[3,3]

    # Mallett-Yuksel basis (mode="mallett" only): f32[3, Kb].
    basis_values: Optional[jnp.ndarray] = None
    basis_low: float = 0.0
    basis_inv_step: float = 0.0

    # Meng et al. 2015 grid (mode="meng" only): dict of device arrays +
    # static ints (see spectra/upsample_meng.py).
    meng: Optional[dict] = None

    # Jakob-Hanika 2019 coefficient cube (mode="jakob" only).
    jakob: Optional[dict] = None

    # Host-side spectra kept for scene building (not traced).
    host: Optional[dict] = dataclasses.field(default=None, compare=False)


# Register ColorTables as a pytree so it can cross jit boundaries.  The
# ``host`` dict is host-only (numpy / Spectrum objects) and intentionally
# dropped on flatten: jitted code never touches it, and keeping it out of the
# aux data keeps treedefs hashable.
_CT_CHILDREN = (
    "obs_values",
    "d65_values",
    "d65_rad_xyz",
    "matr_lrgb_to_xyz",
    "matr_xyz_to_lrgb",
    "basis_values",
    "meng",
    "jakob",
)
_CT_AUX = ("obs_low", "obs_inv_step", "d65_low", "d65_inv_step", "basis_low", "basis_inv_step")


def _ct_flatten(t: "ColorTables"):
    return (
        tuple(getattr(t, f) for f in _CT_CHILDREN),
        tuple(getattr(t, f) for f in _CT_AUX),
    )


def _ct_unflatten(aux, children):
    kw = dict(zip(_CT_CHILDREN, children))
    kw.update(dict(zip(_CT_AUX, aux)))
    return ColorTables(host=None, **kw)


jax.tree_util.register_pytree_node(ColorTables, _ct_flatten, _ct_unflatten)


def build_color_tables(cfg: RenderConfig, dtype=jnp.float32) -> ColorTables:
    """Host-side table build; mirrors ``Color::init`` (reference
    src/util/color.cpp:72-155)."""
    obs_file, obs_lo, obs_hi = _OBS_FILES[cfg.observer]
    cols = load_spectral_csv(obs_file)
    assert len(cols) == 3
    obs = [Spectrum(c, obs_lo, obs_hi) for c in cols]

    # D65: load, then rescale from "100 at 560nm" normalization to physical
    # spectral radiance using Planck's law at the c2-corrected 6500K
    # (reference src/util/color.cpp:97-120).
    d65_cols = load_spectral_csv("d65-300+5+780.csv")
    assert len(d65_cols) == 1
    d65_orig = Spectrum(d65_cols[0], 300.0, 780.0)
    assert d65_orig.sample_linear(560.0) == 100.0  # color.cpp:115 invariant
    temp_d65 = 6500.0 * (H * C / K_B) / 1.438e-2
    scalar = 0.00001 * planck(560.0, temp_d65)
    d65_rad = d65_orig * scalar
    d65_rad_xyz = np.array(
        [Spectrum.integrate_product(d65_rad, o) for o in obs], dtype=np.float64
    )

    basis_values = None
    basis_low = 0.0
    basis_inv_step = 0.0
    basis_host = None
    meng = None
    jakob = None
    if cfg.mode == MODE_MENG:
        from simple_spectral_tpu.spectra.upsample_meng import load_meng_tables

        meng = load_meng_tables(dtype)
    if cfg.mode == MODE_JAKOB:
        from simple_spectral_tpu.spectra.upsample_jakob import load_jakob_tables

        jakob = load_jakob_tables(dtype)
    if cfg.mode == MODE_MALLETT:
        basis_file, b_lo, b_hi = _BASIS_FILES[cfg.observer]
        bcols = load_spectral_csv(basis_file)
        assert len(bcols) == 3
        basis_host = [Spectrum(c, b_lo, b_hi) for c in bcols]
        basis_values = jnp.asarray(np.stack([c for c in bcols]), dtype=dtype)
        basis_low = float(b_lo)
        basis_inv_step = float(1.0 / basis_host[0].step)

    m_rgb2xyz = calc_matr_rgb_to_xyz(BT709_XY, d65_rad_xyz)
    m_xyz2rgb = np.linalg.inv(m_rgb2xyz)

    return ColorTables(
        obs_values=jnp.asarray(np.stack([o.values for o in obs]), dtype=dtype),
        obs_low=float(obs_lo),
        obs_inv_step=float(1.0 / obs[0].step),
        d65_values=jnp.asarray(d65_rad.values, dtype=dtype),
        d65_low=float(d65_rad.low),
        d65_inv_step=float(1.0 / d65_rad.step),
        d65_rad_xyz=jnp.asarray(d65_rad_xyz, dtype=dtype),
        matr_lrgb_to_xyz=jnp.asarray(m_rgb2xyz, dtype=dtype),
        matr_xyz_to_lrgb=jnp.asarray(m_xyz2rgb, dtype=dtype),
        basis_values=basis_values,
        basis_low=basis_low,
        basis_inv_step=basis_inv_step,
        meng=meng,
        jakob=jakob,
        host={
            "obs": obs,
            "d65_orig": d65_orig,
            "d65_rad": d65_rad,
            "d65_rad_xyz": d65_rad_xyz,
            "basis": basis_host,
            "matr_lrgb_to_xyz": m_rgb2xyz,
            "matr_xyz_to_lrgb": m_xyz2rgb,
        },
    )


# --- gamma (exact sRGB piecewise; reference src/util/color.hpp:84-97) ---


def lrgb_to_srgb(lrgb):
    lo = 12.92 * lrgb
    hi = 1.055 * jnp.power(jnp.maximum(lrgb, 1e-30), 1.0 / 2.4) - 0.055
    return jnp.where(lrgb < 0.0031308, lo, hi)


def srgb_to_lrgb(srgb):
    lo = srgb / 12.92
    hi = jnp.power(jnp.maximum((srgb + 0.055) / 1.055, 1e-30), 2.4)
    return jnp.where(srgb < 0.04045, lo, hi)


def lrgb_to_srgb_np(lrgb: np.ndarray) -> np.ndarray:
    lrgb = np.asarray(lrgb)
    return np.where(
        lrgb < 0.0031308,
        12.92 * lrgb,
        1.055 * np.power(np.maximum(lrgb, 1e-30), 1.0 / 2.4) - 0.055,
    )


def srgb_to_lrgb_np(srgb: np.ndarray) -> np.ndarray:
    srgb = np.asarray(srgb)
    return np.where(
        srgb < 0.04045,
        srgb / 12.92,
        np.power(np.maximum((srgb + 0.055) / 1.055, 1e-30), 2.4),
    )


# --- XYZ conversions ---


def apply_mat3(m, v):
    """f32[3,3] x f32[...,3] -> f32[...,3] in full f32 precision.

    NOTE: written as explicit FMAs rather than einsum/dot because JAX's
    default matmul precision on TPU is bfloat16, which would quantize color
    matrices to 8 mantissa bits (~3e-3 relative error -- fatal for the
    ~2e-5 round-trip oracle, reference src/main.cpp:242-245).
    """
    return (
        m[:, 0] * v[..., 0, None] + m[:, 1] * v[..., 1, None] + m[:, 2] * v[..., 2, None]
    )


def ciexyz_to_lrgb(tables: ColorTables, xyz):
    """xyz: f32[...,3] -> lrgb f32[...,3] (reference src/util/color.hpp:150-152)."""
    return apply_mat3(tables.matr_xyz_to_lrgb, xyz)


def lrgb_to_ciexyz(tables: ColorTables, lrgb):
    return apply_mat3(tables.matr_lrgb_to_xyz, lrgb)


# Meng et al.'s hard-coded legacy matrices, preserved for fidelity with their
# results (reference src/util/color.cpp:189-193, 248-252).
MENG_M_RGB_TO_XYZ = np.array(
    [
        [0.41231515, 0.3576, 0.1805],
        [0.2126, 0.7152, 0.0722],
        [0.01932727, 0.1192, 0.95063333],
    ],
    dtype=np.float64,
)
MENG_M_XYZ_TO_RGB = np.array(
    [
        [3.24156456, -1.53766524, -0.49870224],
        [-0.96920119, 1.87588535, 0.04155324],
        [0.05562416, -0.20395525, 1.05685902],
    ],
    dtype=np.float64,
)


def ciexyz_to_srgb(tables: ColorTables, xyz, mode: str):
    """Direct XYZ -> sRGB; mode-dependent (reference src/util/color.cpp:237-257)."""
    if mode == MODE_MENG:
        xyz_rel = xyz / tables.d65_rad_xyz[1]
        lrgb = apply_mat3(jnp.asarray(MENG_M_XYZ_TO_RGB, xyz.dtype), xyz_rel)
    else:
        lrgb = ciexyz_to_lrgb(tables, xyz)
    return lrgb_to_srgb(lrgb)


# --- hero-sample Monte Carlo XYZ estimator (the device hot path) ---


def specradflux_to_ciexyz_hero(
    tables: ColorTables, flux, lambda_0, n_wavelengths: int, lambda_step: float
):
    """MC estimate of XYZ from a hero sample of spectral radiant flux.

    flux: f32[..., S]; lambda_0: f32[...] -> f32[..., 3].
    XYZ_c = sum_i obs_c(lambda_i) * flux_i * LAMBDA_STEP
    (reference src/util/color.hpp:115-139).
    """
    lams = hero_wavelengths(lambda_0, n_wavelengths, lambda_step)  # [..., S]
    xyz = []
    for c in range(3):
        obs_c = sample_linear(tables.obs_values[c], tables.obs_low, tables.obs_inv_step, lams)
        xyz.append(jnp.sum(obs_c * flux, axis=-1) * lambda_step)
    return jnp.stack(xyz, axis=-1)


def specradflux_to_ciexyz_hero_soa(
    tables: ColorTables, flux, lambda_0, n_wavelengths: int, lambda_step: float,
    lambda_min: float | None = None,
):
    """SoA (lane-last) hero-sample XYZ estimator: flux f32[S, N],
    lambda_0 f32[N] -> f32[3, N].

    Same math as :func:`specradflux_to_ciexyz_hero` restructured for the TPU:
    the per-wavelength observer lookups become one hat-weight contraction
    shared by all three channels, followed by a tiny [3,K]x[K,N] matmul.

    Shifted-window form (round 5): hero wavelengths are lam0 + s*STEP, and
    STEP is an integer multiple R of the observer pitch for both shipped
    observers (1931: 100/5 nm, 2006: 110/1 nm), so
    hat(x0 + sR - k) == hat(x0 - (k - sR)): the S per-wavelength hat rows
    are SHIFTED copies of one [W=R+2, N] window against S static row
    slices of the observer table.  The general form materializes the full
    [K, S, N] hat tensor -- measured 5.9 ms of the 55 ms meng-2006
    fwd+bwd call (K=441 at 1-nm pitch; xplane profile, round 5) -- while
    the window form is [112, N] once.  ``lambda_min`` enables it (static
    window origin); callers that cannot supply it get the general form.
    """
    from simple_spectral_tpu.spectra.spectrum import hat_weights, hero_lams_soa

    k_dim = tables.obs_values.shape[-1]
    if lambda_min is not None and n_wavelengths >= 1:
        r_ratio = lambda_step * tables.obs_inv_step
        r_int = int(round(r_ratio))
        j0 = (lambda_min - tables.obs_low) * tables.obs_inv_step
        j0_int = int(round(j0))
        if (
            abs(r_ratio - r_int) < 1e-9
            and abs(j0 - j0_int) < 1e-9
            and j0_int >= 0
            and r_int >= 1
        ):
            w_width = r_int + 2  # hat support for x0' in [0, R] incl. edge
            x0 = (lambda_0 - tables.obs_low) * tables.obs_inv_step - j0_int
            iota_j = jax.lax.broadcasted_iota(jnp.float32, (w_width, 1), 0)
            w0 = jnp.maximum(0.0, 1.0 - jnp.abs(x0[None, :] - iota_j))  # [W, N]
            # static observer row windows, zero-padded past the table edge
            # (exactly the hat's zero-outside-range semantics)
            obs = tables.obs_values  # [3, K]
            need = j0_int + (n_wavelengths - 1) * r_int + w_width
            if need > k_dim:
                obs = jnp.concatenate(
                    [obs, jnp.zeros((3, need - k_dim), obs.dtype)], axis=1
                )
            ow = jnp.stack(
                [
                    obs[:, j0_int + s * r_int: j0_int + s * r_int + w_width]
                    for s in range(n_wavelengths)
                ],
                axis=1,
            )  # [3, S, W]
            t = jnp.einsum(
                "csj,jn->csn", ow, w0, precision=jax.lax.Precision.HIGHEST
            )  # [3, S, N]
            return jnp.einsum(
                "csn,sn->cn", t, flux, precision=jax.lax.Precision.HIGHEST
            ) * lambda_step

    lams = hero_lams_soa(lambda_0, n_wavelengths, lambda_step)  # [S, N]
    x = (lams - tables.obs_low) * tables.obs_inv_step
    w = hat_weights(x, k_dim)  # [K, S, N]
    acc = jnp.sum(w * flux[None, :, :], axis=1)  # [K, N]
    return jnp.einsum(
        "ck,kn->cn", tables.obs_values, acc, precision=jax.lax.Precision.HIGHEST
    ) * lambda_step


# --- full-spectrum XYZ (host, init-time; reference src/util/color.hpp:106-111) ---


def specradflux_to_ciexyz_host(tables: ColorTables, flux: Spectrum) -> np.ndarray:
    return np.array(
        [Spectrum.integrate_product(flux, o) for o in tables.host["obs"]], dtype=np.float64
    )


# --- round trip (testing oracle; reference src/util/color.cpp:259-296) ---


def round_trip_lrgb(tables: ColorTables, lrgb, lambda_step_unused=None):
    """Deterministic lRGB -> reflectance spectrum -> D65 radiance -> XYZ ->
    lRGB round trip (mallett mode), vectorized over a batch.

    Replicates reference src/util/color.cpp:260-289 with the same node-based
    trapezoid product integral the reference uses.  lrgb: f32[...,3].
    """
    assert tables.basis_values is not None, "round trip is defined for mallett mode"
    # Reflectance spectrum on the basis grid: [..., Kb].  Explicit FMAs, not
    # einsum -- see apply_mat3 note on default matmul precision.
    refl = (
        lrgb[..., 0, None] * tables.basis_values[0]
        + lrgb[..., 1, None] * tables.basis_values[1]
        + lrgb[..., 2, None] * tables.basis_values[2]
    )
    # Multiply by D65 sampled (nearest == exact at grid nodes) on basis grid.
    kb = tables.basis_values.shape[-1]
    basis_step = 1.0 / tables.basis_inv_step
    lams = tables.basis_low + basis_step * jnp.arange(kb, dtype=refl.dtype)
    d65_at = sample_linear(tables.d65_values, tables.d65_low, tables.d65_inv_step, lams)
    radiance = refl * d65_at  # [..., Kb] on [basis_low, basis_high]
    # Product-integrate against the observer with the merged-node trapezoid
    # (reference src/spectrum.cpp:134-173).  Both spectra share grids whose
    # merged nodes are the union of (basis nodes +- one step) and (obs nodes
    # +- one step); compute on the fine common grid.
    obs_step = 1.0 / tables.obs_inv_step
    step = min(basis_step, obs_step)
    hi_basis = tables.basis_low + basis_step * (kb - 1)
    hi_obs = tables.obs_low + obs_step * (tables.obs_values.shape[-1] - 1)
    lo = max(tables.basis_low - basis_step, tables.obs_low - obs_step)
    hi = min(hi_basis + basis_step, hi_obs + obs_step)
    npts = int(round((hi - lo) / step)) + 1
    grid = lo + step * jnp.arange(npts, dtype=refl.dtype)
    rad_g = _sample_linear_batched(radiance, tables.basis_low, 1.0 / basis_step, grid)
    xyz = []
    for c in range(3):
        obs_g = sample_linear(tables.obs_values[c], tables.obs_low, tables.obs_inv_step, grid)
        prod = rad_g * obs_g  # [..., npts]
        integral = jnp.sum(0.5 * (prod[..., :-1] + prod[..., 1:]) * step, axis=-1)
        xyz.append(integral)
    xyz = jnp.stack(xyz, axis=-1)
    return ciexyz_to_lrgb(tables, xyz)


def _sample_linear_batched(values, low, inv_step, lam):
    """sample_linear where ``values`` has batch dims [..., K] and ``lam`` is a
    shared 1-D grid [G] -> [..., G]."""
    x = (lam - low) * inv_step
    i0f = jnp.floor(x)
    frac = x - i0f
    i0 = i0f.astype(jnp.int32)
    n = values.shape[-1]
    v0 = jnp.where((i0 >= 0) & (i0 < n), values[..., jnp.clip(i0, 0, n - 1)], 0.0)
    i1 = i0 + 1
    v1 = jnp.where((i1 >= 0) & (i1 < n), values[..., jnp.clip(i1, 0, n - 1)], 0.0)
    return v0 * (1.0 - frac) + v1 * frac
