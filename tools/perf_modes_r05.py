"""Round-5: measure the u32 texel formats against the f32-row formats.

Round 4 established the textured configs are texel-fetch bound (merged
[B*N]-index row gathers at ~11-17 ns/idx in context; PERF.md).  Round 5
adds one-u32-per-texel formats (config.texel_format="u32"): jakob's
asinh-companded q32 coefficients and meng's raw-sRGB-texel + on-device
gather-free grid walk.  This measures BASELINE cfg3/cfg4 (and cfg2 as a
control) in both formats on equal 262144-lane footing.

Usage: python tools/perf_modes_r05.py out.json [cfg-filter]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.tpu_bench import measure_rtt, timeit_chained
from tools.perf_modes_r04 import bench, untexture
import tools.perf_modes_r04 as r04

RESULTS = r04.RESULTS


def main():
    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    r04.OUT_PATH = sys.argv[1] if len(sys.argv) > 1 else None
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)

    configs = {
        "cfg4-jakob": RenderConfig(scene="plane-srgb", mode="jakob",
                                   width=512, height=512, els=False),
        "cfg3-meng": RenderConfig(scene="cornell-srgb", mode="meng",
                                  observer=2006, width=256, height=256),
        "cfg2-mallett": RenderConfig(scene="cornell-srgb", mode="mallett",
                                     width=256, height=256),
    }
    formats = ("u32", "rows")
    for name, cfg0 in configs.items():
        if which != "all" and which not in name:
            continue
        for fmt in formats:
            if "mallett" in name and fmt == "rows":
                continue  # mallett has no rows format
            cfg = cfg0.replace(texel_format=fmt)
            tables = build_color_tables(cfg)
            scene = build_scene(cfg, tables)
            bench(f"{name} [{fmt}]", cfg, scene, tables, 262144, rtt)
        # texture branch isolation only once (format-independent)
        bench(f"{name} NOTEX", cfg, untexture(scene), tables, 262144, rtt)
    r04._flush()
    if r04.OUT_PATH:
        print(f"wrote {r04.OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()
