"""Locate the textured-path cost: the canonical forward step pays ~23 ms
(of 44.6) for the texture branch (tools/perf_ablate.py).  Times each piece
of texture_albedo_deferred standalone at the same scale (9 bounces x 262144
lanes) to find which op misbehaves when fused into the full integrator.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.shading import (
    precompute_basis_hero,
    texel_fetch_lrgb,
    texture_albedo_deferred,
)
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables, srgb_to_lrgb
from tools.tpu_bench import measure_rtt, timeit_chained

N = 262144
D = 9  # bounces that evaluate a texture albedo


def main():
    rtt = measure_rtt()
    print(f"tunnel RTT: {rtt*1e3:.1f} ms", flush=True)
    cfg = RenderConfig(scene="cornell-srgb", mode="mallett", width=512, height=512, spp=64)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    key = jax.random.PRNGKey(0)
    tex_idx = jax.random.randint(key, (D, N), 0, scene.texture.shape[0], jnp.int32)
    lam0 = 380.0 + jax.random.uniform(key, (N,)) * 395.0

    def run(label, fn):
        @jax.jit
        def body(tok):
            acc = jnp.float32(0.0)
            for k in range(D):
                acc = acc + fn(tex_idx[k] + tok)
            return (acc * 1e-30).astype(jnp.int32)

        timeit_chained(label, lambda s, i: body(s), jnp.int32(0), K=12, rtt=rtt)

    run("gather u32 only (9x)", lambda ti: jnp.take(scene.texture, ti, axis=0).astype(jnp.float32).sum())

    def fetch(ti):
        r, g, b = texel_fetch_lrgb(scene, ti)
        return (r + g + b).sum()

    run("gather+unpack+srgb_to_lrgb (9x)", fetch)

    cache = {"basis_hero": precompute_basis_hero(tables, cfg, lam0)}

    def full(ti):
        return texture_albedo_deferred(scene, tables, cfg, cache, ti, lam0).sum()

    run("texture_albedo_deferred mallett (9x)", full)

    # the pow-based gamma alone at the same element count
    rr = jax.random.uniform(key, (3 * D, N))

    def gamma(ti):
        x = rr + (ti[0].astype(jnp.float32) * 1e-30)
        return srgb_to_lrgb(x).sum()

    run("srgb_to_lrgb on [27, N]", gamma)


if __name__ == "__main__":
    main()
