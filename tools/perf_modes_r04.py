"""Round-4: where do the jakob (cfg4) and meng (cfg3) configs lose time?

tools/pack_micro_r04.json killed the round-3 hypothesis (texel-row width:
[T,12] rows gather at 11.3 ns/idx vs 7.25 for 1-D u32 -- packing saves <10%).
This measures the BASELINE cfg3/cfg4 shapes piecewise: render-only forward,
loss forward, forward+backward, and each with the textured material swapped
to a constant albedo (isolating the whole texture branch: gather + per-mode
spectral evaluation).

Usage: python tools/perf_modes_r04.py [out.json]
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_bench import measure_rtt, timeit_chained

RESULTS = []
OUT_PATH = None


def _flush():
    """Write the artifact incrementally: a timeout must not lose results."""
    if OUT_PATH:
        with open(OUT_PATH, "w") as f:
            json.dump({"device": str(jax.devices()[0]),
                       "lanes": 262144, "results": RESULTS}, f, indent=1)


def untexture(scene):
    """Scene surgery: textured materials -> constant albedo 0.7 (the texel
    gather + upsample branch compiles out: has_tex stays True but is_tex
    lanes... simplest is albedo_kind=CONSTANT and texture=None)."""
    from simple_spectral_tpu.scene.types import ALBEDO_CONSTANT

    kinds = np.asarray(scene.materials.albedo_kind).copy()
    kinds[:] = ALBEDO_CONSTANT
    mats = dataclasses.replace(scene.materials, albedo_kind=jnp.asarray(kinds))
    return dataclasses.replace(scene, materials=mats, texture=None)


def bench(label, cfg, scene, tables, rays_per_call, rtt, k=16):
    from simple_spectral_tpu.render.renderer import _render_chunk
    from simple_spectral_tpu.render.trainstep import (
        forward_backward_step,
        forward_only_step,
    )

    key = jax.random.PRNGKey(0)
    lanes = rays_per_call
    px = jnp.arange(lanes, dtype=jnp.int32) % (cfg.width * cfg.height)
    target = jnp.zeros((lanes, 3), jnp.float32)
    rays = lanes * ((2 * cfg.max_depth - 1) if cfg.els else cfg.max_depth)

    def mk(fn, state_leaf):
        def step(state, i):
            leaf = jax.tree.leaves(state)[0]
            tok = (jnp.ravel(leaf)[0] * 1e-30).astype(jnp.int32)
            k2 = jax.random.fold_in(jax.random.fold_in(key, i), tok)
            return fn(k2)
        return step

    todo = [
        ("render", lambda k2: _render_chunk(scene, tables, cfg, k2, px, 1)),
        ("fwd+bwd", lambda k2: forward_backward_step(scene, tables, cfg, k2, px, target, 1)),
    ]
    if os.environ.get("MODES_FWD", "0") == "1":
        todo.insert(1, ("fwd", lambda k2: forward_only_step(
            scene, tables, cfg, k2, px, target, 1)))
    for name, fn in todo:
        step = mk(fn, None)
        s0 = step((jnp.zeros(()),), 0)
        dt = timeit_chained("", step, s0, K=k, rtt=rtt, quiet=True)
        RESULTS.append({"label": f"{label} {name}", "ms": round(dt * 1e3, 3),
                        "mrays_s": round(rays / dt / 1e6, 2)})
        print(f"{label} {name:8s} {dt*1e3:9.2f} ms  {rays/dt/1e6:8.2f} Mrays/s",
              flush=True)
        _flush()


def main():
    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    global OUT_PATH
    OUT_PATH = sys.argv[1] if len(sys.argv) > 1 else None
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
    for name, cfg in configs.items():
        if which != "all" and which not in name:
            continue
        tables = build_color_tables(cfg)
        scene = build_scene(cfg, tables)
        lanes = 262144  # equal-lane footing for every config
        bench(name, cfg, scene, tables, lanes, rtt)
        bench(name + " NOTEX", cfg, untexture(scene), tables, lanes, rtt)
    _flush()
    if OUT_PATH:
        print(f"wrote {OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()
