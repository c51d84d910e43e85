"""Spectral-upsampling parity against the reference's own vendored C code.

Strongest possible oracle: compile the ACTUAL reference implementation
(Meng grid header / rgb2spec.c) into a tiny dump utility and compare our
jnp re-implementations bit-for-float32-bit on randomized inputs.  The C
sources are used in place from /root/reference (read-only), never copied.
"""

import os
import shutil
import subprocess
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.spectra import colorimetry as cm
from simple_spectral_tpu.spectra.upsample_meng import (
    lrgb_to_specrefl_meng,
    spectrum_xyz_to_p_soa,
)

REF = "/root/reference/src"
HAVE_CC = shutil.which("gcc") or shutil.which("cc")


@pytest.fixture(scope="module")
def tables_meng():
    return cm.build_color_tables(RenderConfig(mode="meng", observer=1931))


@pytest.fixture(scope="module")
def tables_jakob():
    return cm.build_color_tables(RenderConfig(mode="jakob", observer=1931))


def _cc():
    return shutil.which("gcc") or shutil.which("cc")


@pytest.fixture(scope="module")
def meng_c_oracle(tmp_path_factory):
    """Compile a driver around the reference's spectrum_grid.h."""
    if not HAVE_CC:
        pytest.skip("no C compiler")
    d = tmp_path_factory.mktemp("mengc")
    src = d / "drv.c"
    src.write_text(
        '#include <stdio.h>\n#include <stdlib.h>\n#include <alloca.h>\n'
        f'#include "{REF}/meng-et-al.-2015/spectrum_grid.h"\n'
        "int main(int argc, char** argv) {\n"
        "  int n; if (scanf(\"%d\", &n) != 1) return 1;\n"
        "  for (int i = 0; i < n; ++i) {\n"
        "    float xyz[3], lam;\n"
        "    if (scanf(\"%f %f %f %f\", &xyz[0], &xyz[1], &xyz[2], &lam) != 4) return 1;\n"
        "    printf(\"%.9g\\n\", spectrum_xyz_to_p(lam, xyz));\n"
        "  }\n  return 0;\n}\n"
    )
    exe = d / "drv"
    subprocess.run([_cc(), "-O1", "-o", str(exe), str(src), "-lm"], check=True)
    return str(exe)


def test_meng_grid_matches_reference_c(tables_meng, meng_c_oracle, rng):
    n = 4096
    # random XYZ roughly covering the gamut-ish region (including some
    # invalid/out-of-grid points which must return 0 on both sides)
    xyz = rng.uniform(0.0, 120.0, (n, 3))
    lam = rng.uniform(380.0, 780.0, (n,)).astype(np.float32)
    lines = [str(n)] + [
        f"{x:.6f} {y:.6f} {z:.6f} {l:.4f}" for (x, y, z), l in zip(xyz, lam)
    ]
    out = subprocess.run(
        [meng_c_oracle], input="\n".join(lines), capture_output=True, text=True, check=True
    )
    ref = np.asarray([float(v) for v in out.stdout.split()])

    got = np.asarray(
        spectrum_xyz_to_p_soa(
            tables_meng.meng,
            jnp.asarray(xyz[:, 0], jnp.float32),
            jnp.asarray(xyz[:, 1], jnp.float32),
            jnp.asarray(xyz[:, 2], jnp.float32),
            jnp.asarray(lam, jnp.float32)[None, :],
        )
    )[0]
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1e-3)
    assert (err < 1e-3).mean() > 0.999, f"max rel err {err.max()} at {err.argmax()}"


def test_meng_white_is_flat(tables_meng):
    """Equal-energy white upsamples to a near-flat reflectance (Meng's
    central property)."""
    lrgb = jnp.ones((1, 3), jnp.float32)
    lam0 = jnp.asarray([380.0], jnp.float32)
    out = np.asarray(lrgb_to_specrefl_meng(tables_meng, lrgb, lam0, 4, 100.0))[0]
    assert np.isfinite(out).all()
    assert out.std() / out.mean() < 0.12, out
    assert 0.5 < out.mean() < 1.5, out


@pytest.fixture(scope="module")
def jakob_c_oracle(tmp_path_factory):
    """Compile the reference rgb2spec.c + a driver, using OUR fitted table
    exported in the original .coeff format."""
    if not HAVE_CC:
        pytest.skip("no C compiler")
    from tools.export_jakob_coeff import export

    d = tmp_path_factory.mktemp("jakobc")
    coeff_path = export(64, str(d / "table.coeff"))
    src = d / "drv.c"
    src.write_text(
        '#include <stdio.h>\n'
        f'#include "{REF}/jakob-and-hanika-2019/rgb2spec.h"\n'
        "int main(int argc, char** argv) {\n"
        "  RGB2Spec* m = rgb2spec_load(argv[1]);\n"
        "  if (!m) return 2;\n"
        "  int n; if (scanf(\"%d\", &n) != 1) return 1;\n"
        "  for (int i = 0; i < n; ++i) {\n"
        "    float rgb[3], lam, c[RGB2SPEC_N_COEFFS];\n"
        "    if (scanf(\"%f %f %f %f\", &rgb[0], &rgb[1], &rgb[2], &lam) != 4) return 1;\n"
        "    rgb2spec_fetch(m, rgb, c);\n"
        "    printf(\"%.9g\\n\", rgb2spec_eval_precise(c, lam));\n"
        "  }\n  return 0;\n}\n"
    )
    exe = d / "drv"
    subprocess.run(
        [_cc(), "-O1", "-mssse3", "-o", str(exe), str(src),
         f"{REF}/jakob-and-hanika-2019/rgb2spec.c", "-lm"],
        check=True,
    )
    return str(exe), coeff_path


def test_jakob_matches_reference_c(tables_jakob, jakob_c_oracle, rng):
    exe, coeff = jakob_c_oracle
    n = 4096
    rgb = rng.uniform(0.001, 1.0, (n, 3)).astype(np.float32)
    lam = rng.uniform(380.0, 780.0, (n,)).astype(np.float32)
    lines = [str(n)] + [
        f"{r:.6f} {g:.6f} {b:.6f} {l:.4f}" for (r, g, b), l in zip(rgb, lam)
    ]
    out = subprocess.run(
        [exe, coeff], input="\n".join(lines), capture_output=True, text=True, check=True
    )
    ref = np.asarray([float(v) for v in out.stdout.splitlines()[-n:]])

    from simple_spectral_tpu.spectra.upsample_jakob import (
        rgb2spec_eval_soa,
        rgb2spec_fetch_soa,
    )

    c0, c1, c2 = rgb2spec_fetch_soa(
        tables_jakob.jakob,
        jnp.asarray(rgb[:, 0]),
        jnp.asarray(rgb[:, 1]),
        jnp.asarray(rgb[:, 2]),
    )
    got = np.asarray(rgb2spec_eval_soa(c0, c1, c2, jnp.asarray(lam)[None, :]))[0]
    err = np.abs(got - ref)
    assert (err < 2e-4).mean() > 0.999, f"max err {err.max()}"


def test_jakob_round_trip_rgb(tables_jakob, rng):
    """Upsample then re-integrate under D65: must reproduce the input lRGB
    closely (the fit's own objective; tolerance covers trilinear
    interpolation between fitted nodes)."""
    from simple_spectral_tpu.spectra.upsample_jakob import (
        rgb2spec_eval_soa,
        rgb2spec_fetch_soa,
    )
    from simple_spectral_tpu.spectra.spectrum import Spectrum

    t = tables_jakob
    n = 256
    rgb = rng.uniform(0.02, 1.0, (n, 3)).astype(np.float32)
    c0, c1, c2 = rgb2spec_fetch_soa(
        t.jakob, jnp.asarray(rgb[:, 0]), jnp.asarray(rgb[:, 1]), jnp.asarray(rgb[:, 2])
    )
    lams = np.linspace(380.0, 780.0, 81)
    lam_grid = jnp.broadcast_to(jnp.asarray(lams, jnp.float32)[:, None], (lams.size, n))
    s = np.asarray(rgb2spec_eval_soa(c0, c1, c2, lam_grid))
    # integrate under D65 with the 1931 observer; normalize by the whitepoint
    obs = np.stack([o.sample_linear(lams) for o in t.host["obs"]])
    d65 = t.host["d65_rad"].sample_linear(lams)
    m = t.host["matr_xyz_to_lrgb"]
    w = m @ (obs * d65).sum(axis=1)
    got = np.einsum("ij,jk,kn->ni", m, obs * d65[None, :], s) / w[None, :]
    err = np.abs(got - rgb)
    assert err.max() < 0.02, err.max()


def test_jakob_black_is_zero(tables_jakob):
    from simple_spectral_tpu.spectra.upsample_jakob import (
        rgb2spec_eval_soa,
        rgb2spec_fetch_soa,
    )

    c0, c1, c2 = rgb2spec_fetch_soa(
        tables_jakob.jakob, jnp.zeros(1), jnp.zeros(1), jnp.zeros(1)
    )
    out = np.asarray(rgb2spec_eval_soa(c0, c1, c2, jnp.full((4, 1), 550.0)))
    assert np.allclose(out, 0.0, atol=1e-6)


def test_meng_deferred_weights_match_direct(tables_meng, rng):
    """The factored form (meng_cell_weights_soa: position -> 6 point ids +
    weights, used for the precomputed per-texel tables) must reproduce the
    direct grid evaluation exactly, for every wavelength."""
    from simple_spectral_tpu.spectra.upsample_meng import meng_cell_weights_soa

    meng = tables_meng.meng
    n = 2048
    xyz = rng.uniform(0.0, 120.0, (n, 3)).astype(np.float32)
    lam = rng.uniform(380.0, 780.0, (4, n)).astype(np.float32)
    x, y, z = (jnp.asarray(xyz[:, i]) for i in range(3))
    direct = np.asarray(spectrum_xyz_to_p_soa(meng, x, y, z, jnp.asarray(lam)))

    pidx, w = meng_cell_weights_soa(meng, x, y, z)
    spec = meng["pts_spectrum"]
    k_dim = spec.shape[1]
    # evaluate each slot's point spectrum at lam with the same clamped
    # linear reconstruction used by the direct path
    sb = (jnp.asarray(lam) - meng["lam_min"]) / (meng["lam_max"] - meng["lam_min"]) * (
        k_dim - 1
    )
    sb = jnp.clip(sb, 0.0, k_dim - 1)
    sb0 = jnp.floor(sb).astype(jnp.int32)
    sb1 = jnp.minimum(sb0 + 1, k_dim - 1)
    sbf = sb - sb0.astype(jnp.float32)
    spec_flat = spec.reshape(-1)
    recon = jnp.zeros((4, n), jnp.float32)
    for slot in range(6):
        base = pidx[slot] * k_dim
        p0 = jnp.take(spec_flat, base[None, :] + sb0, axis=0)
        p1 = jnp.take(spec_flat, base[None, :] + sb1, axis=0)
        recon = recon + w[slot][None, :] * (p0 * (1.0 - sbf) + p1 * sbf)
    recon = np.asarray(recon)
    err = np.abs(recon - direct) / np.maximum(np.abs(direct), 1e-3)
    assert err.max() < 1e-3, f"max rel err {err.max()}"
