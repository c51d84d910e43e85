"""Micro-benchmark of the closest-hit sweep implementations on the TPU.

Separates the three candidate costs: the XLA [T, N] sweep, the raw Pallas
best-key kernel, and the Pallas wrapper's gather-based attribute recovery --
to locate where the full-step slowdown (tools/check_pallas_tpu.py perf)
comes from.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simple_spectral_tpu.render.intersect import (
    intersect_rays_pallas,
    intersect_rays_soa,
    intersect_rays_soa2,
)
from simple_spectral_tpu.render.intersect_pallas import intersect_best_key
from simple_spectral_tpu.render.vec import V3
from tests.test_intersect_pallas import _random_rays, _scene
from tools.tpu_bench import measure_rtt, timeit_chained


def main():
    rtt = measure_rtt()
    print(f"tunnel RTT: {rtt*1e3:.1f} ms", flush=True)
    scene = _scene("cornell")
    n = 262144
    o, d = _random_rays(scene, n, seed=3)
    ign = jnp.full((n,), -1, jnp.int32)

    def chain_rays(tok):
        # perturb ray origins by a tiny token-dependent amount so each timed
        # call depends on the previous one's result
        t = (tok.astype(jnp.float32) % 1024) * 1e-12
        return V3(o.x + t, o.y, o.z)

    def mk_step(fn):
        @jax.jit
        def body(tok):
            oo = chain_rays(tok)
            out = fn(oo)
            return jnp.sum(out).astype(jnp.int32) % 65536

        return lambda state, i: body(state)

    variants = {
        "xla attrs": lambda oo: intersect_rays_soa(scene, oo, d, ign, 1e-3).dist,
        "xla noattrs": lambda oo: intersect_rays_soa(
            scene, oo, d, ign, 1e-3, need_attrs=False
        ).dist,
        "xla2 attrs": lambda oo: intersect_rays_soa2(scene, oo, d, ign, 1e-3).dist,
        "xla2 noattrs": lambda oo: intersect_rays_soa2(
            scene, oo, d, ign, 1e-3, need_attrs=False
        ).dist,
        "pallas key only": lambda oo: intersect_best_key(
            scene.tri_verts, scene.tri_prim, oo, d, ign, 1e-3
        ).astype(jnp.float32),
        "pallas noattrs": lambda oo: intersect_rays_pallas(
            scene, oo, d, ign, 1e-3, need_attrs=False
        ).dist,
        "pallas attrs": lambda oo: intersect_rays_pallas(
            scene, oo, d, ign, 1e-3
        ).dist,
    }
    for name, fn in variants.items():
        timeit_chained(name, mk_step(fn), jnp.int32(0), K=16, rtt=rtt, rays=n)


if __name__ == "__main__":
    main()
