"""One-time extraction of the Meng et al. 2015 spectral-upsampling DATA
tables from the paper's published header (vendored by the reference at
src/meng-et-al.-2015/spectra_xyz_5nm_380_780_0.97.h) into an .npz shipped
with this package.

This extracts *data* (the quantized spectral locus grid the paper
published), not code; the runtime algorithm is re-implemented TPU-style in
simple_spectral_tpu/spectra/upsample_meng.py.
"""

import re
import sys

import numpy as np

SRC = "/root/reference/src/meng-et-al.-2015/spectra_xyz_5nm_380_780_0.97.h"
DST = "simple_spectral_tpu/data/meng2015-grid.npz"


def main():
    text = open(SRC).read()

    def const_f(name):
        return float(re.search(rf"{name}\s*=\s*([-0-9.e]+)f?;", text).group(1))

    def const_mat(name, n):
        block = re.search(rf"{name}\[\]\s*=\s*\{{(.*?)\}};", text, re.S).group(1)
        vals = [float(v) for v in re.findall(r"[-0-9.eE+]+(?=f)", block)]
        assert len(vals) == n, (name, len(vals))
        return np.asarray(vals, np.float64)

    width = int(const_f("spectrum_grid_width"))
    height = int(const_f("spectrum_grid_height"))
    lam_min = const_f("spectrum_sample_min")
    lam_max = const_f("spectrum_sample_max")
    n_samples = int(const_f("spectrum_num_samples"))
    mat_xy_to_uv = const_mat("spectrum_mat_xy_to_uv", 6)

    # grid cells: { inside, num_points, { idx[6] } }
    grid_block = re.search(
        r"spectrum_grid\[\]\s*=\s*\{(.*?)\n\};", text, re.S
    ).group(1)
    cells = re.findall(r"\{\s*(\d+),\s*(\d+),\s*\{([^}]*)\}\s*\}", grid_block)
    assert len(cells) == width * height, len(cells)
    inside = np.asarray([int(c[0]) for c in cells], np.int32)
    num_pts = np.asarray([int(c[1]) for c in cells], np.int32)
    idx = np.asarray(
        [[int(v) for v in c[2].split(",")] for c in cells], np.int32
    )
    assert idx.shape == (width * height, 6)

    # data points: { { xystar[2] }, { uv[2] }, { spectrum[81] } }
    pts_block = re.search(
        r"spectrum_data_points\[\]\s*=\s*\{(.*?)\n\};", text, re.S
    ).group(1)
    pts = re.findall(
        r"\{\s*\{([^}]*)\},\s*\{([^}]*)\},\s*\{([^}]*)\}\s*\}", pts_block
    )
    uv = np.asarray([[float(v) for v in p[1].split(",")] for p in pts], np.float64)
    spec = np.asarray([[float(v) for v in p[2].split(",")] for p in pts], np.float64)
    assert spec.shape[1] == n_samples
    used = idx[idx >= 0]
    assert used.max() < len(pts), (used.max(), len(pts))

    # equal-energy reflectance normalization constant
    eer = const_f("equal_energy_reflectance")

    np.savez_compressed(
        DST,
        width=width,
        height=height,
        lam_min=lam_min,
        lam_max=lam_max,
        n_samples=n_samples,
        mat_xy_to_uv=mat_xy_to_uv,
        grid_inside=inside,
        grid_num=num_pts,
        grid_idx=idx,
        pts_uv=uv,
        pts_spectrum=spec,
        equal_energy_reflectance=eer,
    )
    print(f"wrote {DST}: {len(pts)} points, {width}x{height} grid, eer={eer}")


if __name__ == "__main__":
    main()
