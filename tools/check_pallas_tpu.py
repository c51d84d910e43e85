"""Compiled-on-TPU validation + timing of the Pallas intersect kernel.

Runs the same HitRecord parity oracle as tests/test_intersect_pallas.py but
with the kernel COMPILED for the real chip (interpret=False), then times the
full canonical forward step with intersect_impl=xla vs =pallas using the
chained-timing harness (tools/tpu_bench.py).

Usage: python tools/check_pallas_tpu.py [parity|perf|all]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.renderer import _render_chunk
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables
from tools.tpu_bench import chain_token, measure_rtt, timeit_chained


def parity():
    from tests.test_intersect_pallas import _random_rays, _scene, assert_hit_parity

    assert jax.default_backend() == "tpu", jax.default_backend()
    for name in ("cornell", "cornell-srgb", "plane-srgb"):
        scene = _scene(name)
        n = 8192
        o, d = _random_rays(scene, n, seed=3)
        ignore = jnp.full((n,), -1, jnp.int32)
        assert_hit_parity(scene, o, d, ignore, interpret=False, edge_flip_budget=2e-3)
        print(f"TPU compiled parity OK: {name} ({n} rays)", flush=True)


def perf():
    rtt = measure_rtt()
    print(f"tunnel RTT: {rtt*1e3:.1f} ms", flush=True)
    n = 262144
    px = jnp.arange(n, dtype=jnp.int32)
    for impl in ("xla", "pallas"):
        cfg = RenderConfig(
            scene="cornell-srgb", mode="mallett", width=512, height=512,
            spp=64, intersect_impl=impl,
        )
        tables = build_color_tables(cfg)
        scene = build_scene(cfg, tables)

        def step(state, i):
            key, tok = state
            key = jax.random.fold_in(key, tok + i)
            out = _render_chunk(scene, tables, cfg, key, px, 1)
            return (key, chain_token(out))

        rays = n * (2 * cfg.max_depth - 1)
        timeit_chained(f"forward intersect={impl}", step,
                       (jax.random.PRNGKey(0), jnp.int32(0)), K=12, rtt=rtt,
                       rays=rays)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("parity", "all"):
        parity()
    if which in ("perf", "all"):
        perf()
