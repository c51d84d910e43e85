"""Fidelity measurement for the q32 jakob texel format (texel_format="u32").

Quantifies, on the shipped texture, the error the asinh-companded
10/11/11-bit coefficient packing (spectra/upsample_jakob.py jakob_q32_pack)
introduces against the exact f32 coefficients, at three levels:

1. pointwise reflectance |err| over (texel, lambda) -- the harshest metric
   (a sigmoid-crossing shift of <1 nm reads as a large pointwise error);
2. per-texel XYZ under the CIE observer (flat illuminant) -- what a
   converged render integrates;
3. 16x16-texel block means of the Y error -- the parity-test geometry
   (tests/artifacts/parity_stats.json tolerances are block means ~4e-3).

Runs on CPU.  Usage: python tools/texel_q32_check.py [out.json]
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    from PIL import Image

    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.spectra.colorimetry import (
        build_color_tables,
        srgb_to_lrgb_np,
    )
    from simple_spectral_tpu.spectra.upsample_jakob import (
        jakob_q32_eval_soa,
        jakob_q32_pack,
        rgb2spec_fetch_soa,
    )
    from simple_spectral_tpu.spectra.spectrum import data_path

    cfg = RenderConfig(scene="plane-srgb", mode="jakob")
    tables = build_color_tables(cfg)
    img = np.asarray(
        Image.open(data_path("scenes", cfg.texture)).convert("RGB"), np.uint8
    )
    side = img.shape[0]
    lrgb = srgb_to_lrgb_np(img.reshape(-1, 3).astype(np.float32) / 255.0)
    c0, c1, c2 = (
        np.asarray(v, np.float64)
        for v in rgb2spec_fetch_soa(tables.jakob, lrgb[:, 0], lrgb[:, 1], lrgb[:, 2])
    )
    words, meta = jakob_q32_pack(c0, c1, c2)

    # exact f32 reference on the observer's wavelength grid
    obs = np.asarray(tables.obs_values, np.float64)  # [3, K]
    k_dim = obs.shape[1]
    lam = tables.obs_low + np.arange(k_dim) / tables.obs_inv_step
    xx = (c0[:, None] * lam[None, :] + c1[:, None]) * lam[None, :] + c2[:, None]
    r_f = 0.5 * xx / np.sqrt(xx * xx + 1.0) + 0.5

    # quantized path through the REAL device decode (jnp, f32)
    import jax.numpy as jnp

    r_q = np.zeros_like(r_f)
    # evaluate at each observer wavelength via the S=1 decode
    for k in range(k_dim):
        out = jakob_q32_eval_soa(
            jnp.asarray(words), jnp.asarray(meta),
            jnp.full((len(words),), np.float32(lam[k])), 1, 0.0,
        )
        r_q[:, k] = np.asarray(out[0], np.float64)

    e = np.abs(r_q - r_f)
    ysum = obs[1].sum()
    xyz_f = (r_f @ obs.T) / ysum
    xyz_q = (r_q @ obs.T) / ysum
    d = np.abs(xyz_q - xyz_f)
    ey = (xyz_q - xyz_f)[:, 1].reshape(side, side)
    nb = side // 16
    bm = ey.reshape(nb, 16, nb, 16).mean(axis=(1, 3))

    result = {
        "texture": cfg.texture,
        "texels": int(len(words)),
        "format": "q32 asinh-companded 10/11/11 (lo/step/sigma meta)",
        "pointwise_refl_err": {
            "max": float(e.max()), "mean": float(e.mean()),
            "p999": float(np.quantile(e, 0.999)),
        },
        "per_texel_xyz_err": {
            "max": float(d.max()), "mean": float(d.mean()),
            "p999": float(np.quantile(d, 0.999)),
        },
        "block16_mean_Y_err": {
            "max_abs": float(np.abs(bm).max()),
            "rms": float(np.sqrt((bm ** 2).mean())),
        },
        "parity_block_tolerance_note":
            "tests/artifacts/parity_stats.json block means ~4e-3; the "
            "block-mean Y error here must sit well inside that",
    }
    print(json.dumps(result, indent=1))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {sys.argv[1]}")


if __name__ == "__main__":
    main()
