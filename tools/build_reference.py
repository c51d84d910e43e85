"""Build and run the C++ reference renderer as a converged-image oracle.

The reference (geometrian/simple-spectral) selects its render mode at
compile time by editing src/stdafx.hpp (reference src/stdafx.hpp:63-93), so
each mode needs its own binary.  This module copies the reference tree into
build_ref/<tag>/, applies the minimal mode edits to the *copy* (the mounted
reference is read-only), and builds with CMake + the GLM shim
(third_party/glm_shim) with SUPPORT_WINDOWED=OFF (reference
CMakeLists.txt:17) so GLFW is not required.

Known deviations applied to the oracle copy, all of them the reference's own
documented fallbacks:
  * cornell-srgb / plane-srgb texture: the checkout is missing
    crystal-lizard-4096.png (reference .MISSING_LARGE_BLOBS); the copy is
    switched to the in-repo 512^2 line the reference itself keeps commented
    out one line above (src/scene.cpp:291-292, 356-357).  Our renders use
    texture="512" to match.
  * jakob mode: the missing .coeff blob is replaced by our re-fitted cube
    exported in the original binary format (tools/export_jakob_coeff.py).

Binaries run with cwd = a shadow directory whose data/ mirrors the
reference's (symlinks) plus the exported .coeff, because all reference data
paths are cwd-relative (src/util/color.cpp:79-144, src/scene.cpp:51-292).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path(os.environ.get("SIMPLE_SPECTRAL_REFERENCE", "/root/reference"))
BUILD_ROOT = REPO / "build_ref"
GLM_SHIM = REPO / "third_party" / "glm_shim"

#: mode tag -> (RENDER_MODE_SPECTRAL on?, ALGNUM)
MODES = {
    "rgb": (False, None),
    "mallett": (True, 1),
    "meng": (True, 2),
    "jakob": (True, 3),
}


def _patch_stdafx(text: str, mode: str, observer: int) -> str:
    spectral, algnum = MODES[mode]
    if not spectral:
        needle = "#if 1\n\t#define RENDER_MODE_SPECTRAL\n"
        assert needle in text, "stdafx.hpp layout changed"
        text = text.replace(needle, "#if 0\n\t#define RENDER_MODE_SPECTRAL\n")
    else:
        old = "#define RENDER_MODE_SPECTRAL_ALGNUM 1"
        assert old in text
        text = text.replace(old, f"#define RENDER_MODE_SPECTRAL_ALGNUM {algnum}")
        if observer == 2006:
            needle = "\t#if 1\n\t\t#define CIE_OBSERVER 1931"
            assert needle in text, "observer block layout changed"
            text = text.replace(needle, "\t#if 0\n\t\t#define CIE_OBSERVER 1931")
    return text


def _patch_scene(text: str) -> str:
    """Switch both hard-coded 4096^2 texture loads to the in-repo 512^2
    fallback the reference keeps commented out (src/scene.cpp:291-292,
    356-357: same pair of lines, cornell-srgb and plane-srgb builders)."""
    out = []
    for line in text.splitlines(keepends=True):
        if "crystal-lizard-4096.png" in line and not line.lstrip().startswith("//"):
            line = line.replace("crystal-lizard-4096.png", "crystal-lizard-512.png")
        out.append(line)
    return "".join(out)


def build_reference(mode: str, observer: int = 1931, quiet: bool = True) -> Path:
    """Build (or reuse) the reference binary for `mode`; returns its path."""
    if mode != "mallett" and observer != 1931:
        raise ValueError("only mallett supports the 2006 observer "
                         "(reference src/stdafx.hpp:107-109)")
    tag = f"{mode}-{observer}"
    root = BUILD_ROOT / tag
    exe = root / "build" / "simple-spectral"
    if exe.exists():
        return exe

    srcdir = root / "checkout"
    if srcdir.exists():
        shutil.rmtree(srcdir)
    srcdir.mkdir(parents=True)
    shutil.copytree(REFERENCE / "src", srcdir / "src")
    shutil.copytree(REFERENCE / "cmake", srcdir / "cmake")
    shutil.copy2(REFERENCE / "CMakeLists.txt", srcdir / "CMakeLists.txt")

    stdafx = srcdir / "src" / "stdafx.hpp"
    stdafx.write_text(_patch_stdafx(stdafx.read_text(), mode, observer))
    scene = srcdir / "src" / "scene.cpp"
    scene.write_text(_patch_scene(scene.read_text()))

    bdir = root / "build"
    bdir.mkdir(parents=True, exist_ok=True)
    kw = dict(cwd=bdir, check=True,
              stdout=subprocess.DEVNULL if quiet else None)
    subprocess.run(
        ["cmake", str(srcdir), "-DSUPPORT_WINDOWED=OFF",
         f"-DGLM_INCLUDE_DIR={GLM_SHIM}", "-DCMAKE_BUILD_TYPE=Release"],
        **kw)
    subprocess.run(["make", f"-j{os.cpu_count()}"], **kw)
    assert exe.exists()
    return exe


def _shadow_cwd(mode: str) -> Path:
    """cwd with a data/ mirroring the reference + our JH coeff if needed."""
    root = BUILD_ROOT / "rundir"
    data = root / "data"
    if not data.exists():
        data.mkdir(parents=True)
        for p in (REFERENCE / "data").iterdir():
            (data / p.name).symlink_to(p)
    if mode == "jakob":
        coeff = data / "jakob-and-hanika-2019-srgb.coeff"
        if not coeff.exists():
            sys.path.insert(0, str(REPO))
            from tools.export_jakob_coeff import export
            export(64, str(coeff))
    return root


def run_reference(mode: str, scene: str, width: int, height: int, spp: int,
                  out_path: str | Path, observer: int = 1931,
                  timeout: float = 1800.0) -> Path:
    """Render `scene` with the reference binary; returns the output path.

    Use a .csv out_path to get exact linear-RGB floats (reference
    src/framebuffer.cpp:40-63) instead of quantized PNG.
    """
    exe = build_reference(mode, observer)
    out_path = Path(out_path).resolve()
    cwd = _shadow_cwd(mode)
    subprocess.run(
        [str(exe), f"--scene={scene}", f"-w={width}", f"-h={height}",
         f"-spp={spp}", f"-o={out_path}"],
        cwd=cwd, check=True, timeout=timeout,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    assert out_path.exists()
    return out_path


def load_reference_csv(path: str | Path, width: int, height: int):
    """Parse the reference's .csv framebuffer dump into lRGB f64[H, W, 3],
    top-to-bottom rows.  The file is one line per scanline, bottom-to-top
    (the framebuffer stores bottom-to-top, reference src/framebuffer.hpp:26),
    'r,g,b' per pixel, no alpha (src/framebuffer.cpp:40-63)."""
    import numpy as np

    txt = Path(path).read_text().strip()
    vals = [float(v) for v in txt.replace("\n", ",").split(",") if v != ""]
    arr = np.asarray(vals, np.float64).reshape(height, width, 3)
    return arr[::-1]


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "mallett"
    exe = build_reference(mode, quiet=False)
    print(f"built {exe}")
