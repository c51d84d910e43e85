"""Measure the reference C++ renderer's wall-clock on this machine.

BASELINE.md lists "CPU wall-clock for canonical config: TO MEASURE" -- the
reference publishes no numbers of its own, so the only measurable baseline
is the built oracle binary timed here, with the BASELINE ray accounting
(19 reference-equivalent rays per sample at depth 10 with ELS).

The binary is the same patched build the image-parity oracle uses
(tools/build_reference.py); it runs all hardware_concurrency() threads
(reference src/renderer.cpp:45).  Numbers are per THIS host's cores --
recorded to quantify the TPU-vs-reference comparison, not as a
hardware-neutral claim.

Usage: python tools/bench_reference_cpu.py [out.json]   (CPU-only; do not
run concurrently with TPU benches or the test suite)
"""

import json
import multiprocessing
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.build_reference import _shadow_cwd, build_reference


def time_reference(mode, scene, w, h, spp, observer=1931):
    exe = build_reference(mode, observer)
    cwd = _shadow_cwd(mode)
    out = Path(f"/tmp/ref_bench_{mode}_{scene}.png").resolve()
    t0 = time.time()
    subprocess.run(
        [str(exe), f"--scene={scene}", f"-w={w}", f"-h={h}", f"-spp={spp}",
         f"-o={out}"],
        cwd=cwd, check=True, timeout=7200,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return time.time() - t0


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rows = []
    # canonical config (BASELINE.md): cornell-srgb 512^2 @ 64 spp, mallett
    for mode, scene, w, spp in (("mallett", "cornell-srgb", 512, 64),):
        wall = time_reference(mode, scene, w, w, spp)
        rays = float(w) * w * spp * 19  # BASELINE ray accounting, depth 10
        rows.append({
            "mode": mode, "scene": scene, "res": w, "spp": spp,
            "wall_s": round(wall, 1),
            "mrays_s": round(rays / wall / 1e6, 3),
            "rays_per_sample": 19,
        })
        print(rows[-1], flush=True)
    result = {
        "host_cores": multiprocessing.cpu_count(),
        "note": "reference C++ renderer (patched oracle build), all "
                "hardware_concurrency() threads, this host's cores only",
        "results": rows,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
