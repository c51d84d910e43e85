"""Meng et al. 2015 spectral upsampling ("meng" mode).

Re-implementation of the paper's published grid interpolation
(reference src/meng-et-al.-2015/spectrum_grid.h:13-137) as branchless
lane-vector math: XYZ -> xy chromaticity -> rotated uv grid coordinate ->
either bilinear interpolation (inner cells) or a masked triangle-fan
barycentric search (boundary cells, <= 6 vertices per cell,
spectra_xyz_5nm_380_780_0.97.h:58-62).  The quantized spectral-locus grid
itself ships as data (data/meng2015-grid.npz, extracted by
tools/extract_meng_data.py).

The reference pipeline feeds this from lRGB via Meng's own (slightly dated)
RGB->XYZ matrix scaled by 100 (reference src/util/color.cpp:174-201); we
replicate that exactly, including the matrix.

Extension beyond the reference: the reference refuses Meng + CIE 2006 at
compile time (src/stdafx.hpp:107-109) because the data stops at 780 nm; we
clamp the spectral lookup to the table's edge bins so the mode runs under
either observer (documented deviation).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.spectra.spectrum import data_path, hero_lams_soa

FLT_MAX = 3.4028235e38


import functools


@functools.lru_cache(maxsize=1)
def meng_grid_meta():
    """Static (trace-time) grid metadata: (lam_min, lam_max, n_samples).

    The ColorTables pytree carries the meng dict as a DYNAMIC child, so its
    float leaves are tracers inside jit; the shifted-window reconstruction
    (render/shading.py) needs the wavelength range as compile-time constants
    to derive its static window geometry.  The values are dataset constants
    of the vendored table (reference spectra_xyz_5nm_380_780_0.97.h: 380-780
    at 5 nm), read once from the same npz the device tables load from.
    """
    z = np.load(data_path("meng2015-grid.npz"))
    return float(z["lam_min"]), float(z["lam_max"]), int(z["pts_spectrum"].shape[1])


def load_meng_tables(dtype=jnp.float32) -> dict:
    """Load the grid into device arrays (called from build_color_tables)."""
    z = np.load(data_path("meng2015-grid.npz"))
    # Per-cell channel matrix for the gather-free device walk
    # (meng_cell_weights_soa_onehot): every cell-indexed table the walk
    # reads, as one [C, 20] block contracted against a cell one-hot --
    # cols (inside, num, pidx x6, pu x6, pv x6).  Point ids stay exact in
    # f32 (small ints, exactly one nonzero one-hot term).
    gi = np.maximum(np.asarray(z["grid_idx"], np.int64), 0)  # [C, 6]
    pu = np.asarray(z["pts_uv"])[gi, 0]  # [C, 6]
    pv = np.asarray(z["pts_uv"])[gi, 1]  # [C, 6]
    cell_chan = np.concatenate(
        [
            np.asarray(z["grid_inside"], np.float64)[:, None],
            np.asarray(z["grid_num"], np.float64)[:, None],
            gi.astype(np.float64),
            pu,
            pv,
        ],
        axis=1,
    )
    return {
        "mat_xy_to_uv": jnp.asarray(z["mat_xy_to_uv"], dtype),  # [6]
        "grid_inside": jnp.asarray(z["grid_inside"], jnp.int32),  # [W*H]
        "grid_num": jnp.asarray(z["grid_num"], jnp.int32),  # [W*H]
        "grid_idx": jnp.asarray(z["grid_idx"], jnp.int32),  # [W*H, 6]
        "pts_uv": jnp.asarray(z["pts_uv"], dtype),  # [P, 2]
        "pts_spectrum": jnp.asarray(z["pts_spectrum"], dtype),  # [P, K]
        "cell_chan": jnp.asarray(cell_chan, dtype),  # [W*H, 20]
        # static metadata (plain Python numbers; see ColorTables aux)
        "width": int(z["width"]),
        "height": int(z["height"]),
        "lam_min": float(z["lam_min"]),
        "lam_max": float(z["lam_max"]),
    }


def spectrum_xyz_to_p_soa(meng: dict, x, y, z, lams):
    """The core grid evaluation: per-lane XYZ (f32[N] x3) and wavelengths
    f32[S, N] -> spectral power f32[S, N] (reference
    src/meng-et-al.-2015/spectrum_grid.h:13-137)."""
    w_grid = meng["width"]
    h_grid = meng["height"]
    ssum = x + y + z
    norm = 1.0 / ssum
    # C: if (!(norm < FLT_MAX)) return 0  -- catches +inf and NaN
    valid = norm < FLT_MAX

    xy_x = x * norm
    xy_y = y * norm
    m = meng["mat_xy_to_uv"]
    u = m[0] * xy_x + m[1] * xy_y + m[2]
    v = m[3] * xy_x + m[4] * xy_y + m[5]
    valid = valid & (u >= 0.0) & (u < w_grid) & (v >= 0.0) & (v < h_grid)

    u_safe = jnp.clip(jnp.where(valid, u, 0.0), 0.0, w_grid - 1e-4)
    v_safe = jnp.clip(jnp.where(valid, v, 0.0), 0.0, h_grid - 1e-4)
    ui = jnp.floor(u_safe).astype(jnp.int32)
    vi = jnp.floor(v_safe).astype(jnp.int32)
    cell = ui + w_grid * vi  # i32[N]

    inside = jnp.take(meng["grid_inside"], cell, axis=0)  # i32[N]
    num = jnp.take(meng["grid_num"], cell, axis=0)  # i32[N]

    # per-slot point data (6 slots, -1 padded)
    pts_uv = meng["pts_uv"]
    spec = meng["pts_spectrum"]
    n_samples = spec.shape[1]
    spec_flat = spec.reshape(-1)

    # wavelength bin (clamped: 2006-observer extension, see module docstring)
    sb = (lams - meng["lam_min"]) / (meng["lam_max"] - meng["lam_min"]) * (n_samples - 1)
    sb = jnp.clip(sb, 0.0, n_samples - 1)
    sb0 = jnp.floor(sb).astype(jnp.int32)
    sb1 = jnp.minimum(sb0 + 1, n_samples - 1)
    sbf = sb - sb0.astype(jnp.float32)

    p_slots, pu_slots, pv_slots = [], [], []
    for slot in range(6):
        pidx = jnp.maximum(jnp.take(meng["grid_idx"][:, slot], cell, axis=0), 0)
        base = pidx * n_samples  # i32[N]
        p0 = jnp.take(spec_flat, base[None, :] + sb0, axis=0)
        p1 = jnp.take(spec_flat, base[None, :] + sb1, axis=0)
        p_slots.append(p0 * (1.0 - sbf) + p1 * sbf)  # [S, N]
        pu_slots.append(jnp.take(pts_uv[:, 0], pidx, axis=0))
        pv_slots.append(jnp.take(pts_uv[:, 1], pidx, axis=0))

    # --- inner-cell fast path: bilinear over the 2x2 quad (grid.h:75-89;
    # vertex layout 2 3 / 0 1) ---
    fu = u_safe - ui.astype(jnp.float32)
    fv = v_safe - vi.astype(jnp.float32)
    p_in = (
        p_slots[0] * (1.0 - fu) * (1.0 - fv)
        + p_slots[2] * (1.0 - fu) * fv
        + p_slots[3] * fu * fv
        + p_slots[1] * fu * (1.0 - fv)
    )

    # --- boundary cells: triangle fan around idx[0] (grid.h:91-131) ---
    def slot_select(slots, k):
        out = slots[0]
        for s in range(1, 6):
            out = jnp.where(k == s, slots[s], out)
        return out

    ex = u_safe - pu_slots[0]
    ey = v_safe - pv_slots[0]
    e_x = [pu_slots[s] - pu_slots[0] for s in range(6)]
    e_y = [pv_slots[s] - pv_slots[0] for s in range(6)]

    e0x, e0y = e_x[1], e_y[1]
    uu = e0x * ey - ex * e0y
    found = jnp.zeros(ex.shape, bool)
    p_fan = jnp.zeros_like(p_in)
    for i in range(5):  # i = 0 .. num-2, num <= 6
        closing = i == (num - 2)
        nxt = jnp.minimum(i + 2, 5)
        e1x = jnp.where(closing, e_x[1], slot_select(e_x, nxt))
        e1y = jnp.where(closing, e_y[1], slot_select(e_y, nxt))
        vv = ex * e1y - e1x * ey
        area = e0x * e1y - e1x * e0y
        area_ok = area != 0.0
        inv_area = jnp.where(area_ok, 1.0 / jnp.where(area_ok, area, 1.0), 0.0)
        bu = uu * inv_area
        bv = vv * inv_area
        bw = 1.0 - bu - bv
        in_tri = (bu >= 0.0) & (bv >= 0.0) & (bw >= 0.0) & (i < num - 1)
        take_this = in_tri & ~found
        p_b = slot_select(p_slots, jnp.minimum(i + 1, 5))
        p_c = jnp.where(closing, p_slots[1], slot_select(p_slots, nxt))
        tri_val = p_slots[0] * bw + p_b * bv + p_c * bu
        p_fan = jnp.where(take_this[None, :], tri_val, p_fan)
        found = found | take_this
        # not accepted: advance the fan edge (grid.h:120-124)
        uu = jnp.where(take_this, uu, -vv)
        e0x = jnp.where(take_this, e0x, e1x)
        e0y = jnp.where(take_this, e0y, e1y)

    p = jnp.where(inside[None, :] > 0, p_in, p_fan)
    ok = valid & (num > 0)
    # return p / norm == p * (X+Y+Z) (grid.h:134-136)
    return jnp.where(ok[None, :], p * ssum[None, :], 0.0)


def _uv_position(meng: dict, x, y, z):
    """Shared XYZ -> grid-uv position math (grid.h:24-45): returns
    (u_safe, v_safe, ui, vi, cell, valid, ssum)."""
    w_grid = meng["width"]
    h_grid = meng["height"]
    ssum = x + y + z
    norm = 1.0 / ssum
    valid = norm < FLT_MAX

    xy_x = x * norm
    xy_y = y * norm
    m = meng["mat_xy_to_uv"]
    u = m[0] * xy_x + m[1] * xy_y + m[2]
    v = m[3] * xy_x + m[4] * xy_y + m[5]
    valid = valid & (u >= 0.0) & (u < w_grid) & (v >= 0.0) & (v < h_grid)

    u_safe = jnp.clip(jnp.where(valid, u, 0.0), 0.0, w_grid - 1e-4)
    v_safe = jnp.clip(jnp.where(valid, v, 0.0), 0.0, h_grid - 1e-4)
    ui = jnp.floor(u_safe).astype(jnp.int32)
    vi = jnp.floor(v_safe).astype(jnp.int32)
    cell = ui + w_grid * vi
    return u_safe, v_safe, ui, vi, cell, valid, ssum


def meng_cell_weights_soa(meng: dict, x, y, z):
    """Factor the grid evaluation into per-position point weights: returns
    (pidx i32[6, N], w f32[6, N]) such that
    ``spectrum_xyz_to_p(lam, xyz) == sum_slot w[slot] * spectrum(pidx[slot], lam)``
    for every wavelength.  The split is exact because the interpolation
    weights (bilinear inside, triangle-fan barycentric on the boundary,
    reference src/meng-et-al.-2015/spectrum_grid.h:75-131) depend only on the
    chromaticity position, not on lambda -- which lets callers precompute
    them once per texel and defer all spectral evaluation (SURVEY.md C17).
    The 1/norm scale (grid.h:134-136) is folded into w.

    Cell tables are read with per-lane gathers -- right for host/build-time
    use; inside a device hot loop use meng_cell_weights_soa_onehot."""
    u_safe, v_safe, ui, vi, cell, valid, ssum = _uv_position(meng, x, y, z)

    inside = jnp.take(meng["grid_inside"], cell, axis=0)
    num = jnp.take(meng["grid_num"], cell, axis=0)

    pidx_slots, pu_slots, pv_slots = [], [], []
    for slot in range(6):
        pidx = jnp.maximum(jnp.take(meng["grid_idx"][:, slot], cell, axis=0), 0)
        pidx_slots.append(pidx)
        pu_slots.append(jnp.take(meng["pts_uv"][:, 0], pidx, axis=0))
        pv_slots.append(jnp.take(meng["pts_uv"][:, 1], pidx, axis=0))

    return _cell_weights_core(
        u_safe, v_safe, ui, vi, inside, num,
        pidx_slots, pu_slots, pv_slots, valid, ssum,
    )


def meng_cell_weights_soa_onehot(meng: dict, x, y, z):
    """Gather-free variant of meng_cell_weights_soa for device hot paths
    (config.texel_format="u32"): every cell-indexed table read becomes ONE
    one-hot contraction over the 168 grid cells (dense VPU compare + MXU
    matmul -- exactly one nonzero term per lane, so f32 results including
    the integer point ids are exact).  Per-lane gathers cost ~7-9 ns/index
    on v5e (tools/pack_micro_r04.json); the 20 channels here would cost 20
    gathers/lane, while the contraction is ~2*20*168 flops/lane of dense
    math.  Identical arithmetic to the gather variant from the channel
    values onward."""
    u_safe, v_safe, ui, vi, cell, valid, ssum = _uv_position(meng, x, y, z)

    cell_chan = meng["cell_chan"]  # [C, 20]
    n_cells = cell_chan.shape[0]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (n_cells, 1), 0)
    oh = (iota_c == cell[None, :]).astype(jnp.float32)  # [C, N]
    chans = jnp.einsum(
        "ck,cn->kn", cell_chan, oh, precision=jax.lax.Precision.HIGHEST
    )  # [20, N]
    inside = chans[0].astype(jnp.int32)
    num = chans[1].astype(jnp.int32)
    pidx_slots = [chans[2 + s].astype(jnp.int32) for s in range(6)]
    pu_slots = [chans[8 + s] for s in range(6)]
    pv_slots = [chans[14 + s] for s in range(6)]

    return _cell_weights_core(
        u_safe, v_safe, ui, vi, inside, num,
        pidx_slots, pu_slots, pv_slots, valid, ssum,
    )


def _cell_weights_core(u_safe, v_safe, ui, vi, inside, num,
                       pidx_slots, pu_slots, pv_slots, valid, ssum):
    # inner-cell bilinear weights (vertex layout 2 3 / 0 1, grid.h:75-89)
    fu = u_safe - ui.astype(jnp.float32)
    fv = v_safe - vi.astype(jnp.float32)
    w_in = [
        (1.0 - fu) * (1.0 - fv),  # slot 0
        fu * (1.0 - fv),  # slot 1
        (1.0 - fu) * fv,  # slot 2
        fu * fv,  # slot 3
        jnp.zeros_like(fu),
        jnp.zeros_like(fu),
    ]

    # boundary cells: triangle fan around idx[0] (grid.h:91-131)
    def slot_select(slots, k):
        out = slots[0]
        for s in range(1, 6):
            out = jnp.where(k == s, slots[s], out)
        return out

    ex = u_safe - pu_slots[0]
    ey = v_safe - pv_slots[0]
    e_x = [pu_slots[s] - pu_slots[0] for s in range(6)]
    e_y = [pv_slots[s] - pv_slots[0] for s in range(6)]

    e0x, e0y = e_x[1], e_y[1]
    uu = e0x * ey - ex * e0y
    found = jnp.zeros(ex.shape, bool)
    w_fan = [jnp.zeros_like(fu) for _ in range(6)]
    for i in range(5):
        closing = i == (num - 2)
        nxt = jnp.minimum(i + 2, 5)
        e1x = jnp.where(closing, e_x[1], slot_select(e_x, nxt))
        e1y = jnp.where(closing, e_y[1], slot_select(e_y, nxt))
        vv = ex * e1y - e1x * ey
        area = e0x * e1y - e1x * e0y
        area_ok = area != 0.0
        inv_area = jnp.where(area_ok, 1.0 / jnp.where(area_ok, area, 1.0), 0.0)
        bu = uu * inv_area
        bv = vv * inv_area
        bw = 1.0 - bu - bv
        in_tri = (bu >= 0.0) & (bv >= 0.0) & (bw >= 0.0) & (i < num - 1)
        take_this = in_tri & ~found
        # value = p[0]*bw + p[i+1]*bv + p[closing ? 1 : nxt]*bu (grid.h:112-118)
        t = take_this
        w_fan[0] = jnp.where(t, w_fan[0] + bw, w_fan[0])
        bslot = min(i + 1, 5)
        w_fan[bslot] = jnp.where(t, w_fan[bslot] + bv, w_fan[bslot])
        for s in range(6):
            hit_c = t & (jnp.where(closing, 1, nxt) == s)
            w_fan[s] = jnp.where(hit_c, w_fan[s] + bu, w_fan[s])
        found = found | take_this
        uu = jnp.where(take_this, uu, -vv)
        e0x = jnp.where(take_this, e0x, e1x)
        e0y = jnp.where(take_this, e0y, e1y)

    ok = valid & (num > 0)
    scale = jnp.where(ok, ssum, 0.0)  # p / norm == p * (X+Y+Z)
    w_out = []
    for s in range(6):
        wsel = jnp.where(inside > 0, w_in[s], w_fan[s])
        w_out.append(wsel * scale)
    return jnp.stack(pidx_slots), jnp.stack(w_out)


def lrgb_to_xyz_meng(r, g, b):
    """lRGB -> XYZ via Meng's matrix x100 (reference
    src/util/color.cpp:174-201)."""
    from simple_spectral_tpu.spectra.colorimetry import MENG_M_RGB_TO_XYZ

    m = MENG_M_RGB_TO_XYZ
    x = (m[0, 0] * r + m[0, 1] * g + m[0, 2] * b) * 100.0
    y = (m[1, 0] * r + m[1, 1] * g + m[1, 2] * b) * 100.0
    z = (m[2, 0] * r + m[2, 1] * g + m[2, 2] * b) * 100.0
    return x, y, z


def lrgb_to_specrefl_meng_soa(tables, cfg: RenderConfig, r, g, b, lam0):
    """lRGB -> hero reflectance via Meng's matrix x100 then the grid
    (reference src/util/color.cpp:174-201).  -> f32[S, N]."""
    from simple_spectral_tpu.spectra.colorimetry import MENG_M_RGB_TO_XYZ

    m = MENG_M_RGB_TO_XYZ
    x = (m[0, 0] * r + m[0, 1] * g + m[0, 2] * b) * 100.0
    y = (m[1, 0] * r + m[1, 1] * g + m[1, 2] * b) * 100.0
    z = (m[2, 0] * r + m[2, 1] * g + m[2, 2] * b) * 100.0
    lams = hero_lams_soa(lam0, cfg.n_wavelengths, cfg.lambda_step)
    return spectrum_xyz_to_p_soa(tables.meng, x, y, z, lams)


def lrgb_to_specrefl_meng(tables, lrgb, lambda_0, n_wavelengths: int, lambda_step: float):
    """Row-layout convenience wrapper: lrgb f32[...,3], lambda_0 f32[...]
    -> f32[..., S]."""
    import types

    shape = lambda_0.shape
    cfg = types.SimpleNamespace(n_wavelengths=n_wavelengths, lambda_step=lambda_step)
    out = lrgb_to_specrefl_meng_soa(
        tables,
        cfg,
        lrgb[..., 0].reshape(-1),
        lrgb[..., 1].reshape(-1),
        lrgb[..., 2].reshape(-1),
        lambda_0.reshape(-1),
    )
    return jnp.moveaxis(out, 0, -1).reshape(shape + (n_wavelengths,))
