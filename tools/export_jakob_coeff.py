"""Export our fitted Jakob-Hanika table in the original ``.coeff`` binary
format (reference src/jakob-and-hanika-2019/rgb2spec.c:11-47: "SPEC" magic,
uint32 res, f32 scale[res], f32 data[3*res^3*3]).

This regenerates the artifact missing from the reference's own checkout --
the original C renderer can run against the exported file.
"""

import struct
import sys

import numpy as np

from simple_spectral_tpu.spectra.spectrum import data_path


def export(res: int = 64, dst: str = None) -> str:
    z = np.load(data_path(f"jakob2019-srgb-{res}.npz"))
    scale = np.asarray(z["scale"], np.float32)
    coeffs = np.asarray(z["coeffs"], np.float32)  # [3, res, res, res, 3]
    assert scale.shape == (res,) and coeffs.shape == (3, res, res, res, 3)
    dst = dst or data_path(f"jakob-and-hanika-2019-srgb-{res}.coeff")
    with open(dst, "wb") as f:
        f.write(b"SPEC")
        f.write(struct.pack("<I", res))
        f.write(scale.tobytes())
        f.write(coeffs.tobytes())
    return dst


if __name__ == "__main__":
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    print(export(res))
