"""Weak-scaling efficiency of the sharded forward+backward step.

Implements the protocol documented in parallel/multihost.py: per-chip lane
count held constant while the dp mesh grows 1 -> 2 -> 4 -> ... over the
available devices; efficiency(K) = Mrays/s(K) / (K * Mrays/s(1)).

On the CPU host this exercises the sharding path over the virtual device
mesh (functional check + relative numbers; absolute Mrays/s are meaningless
on CPU).  On a TPU slice it produces the BASELINE scaling-efficiency metric
(target: >= 85% at 2+ hosts).  Multi-host runs launch one process per host
with --coordinator/--num-processes/--process-id before any jax use.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py [out.json] [--lanes-per-dev 4096] [--spp 4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.parallel.sharding import make_mesh, sharded_loss_and_grad
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables
from tools.tpu_bench import measure_rtt, timeit_chained


def bench_mesh(cfg, scene, tables, n_dev, lanes_per_dev, spp, rtt):
    mesh = make_mesh(jax.devices()[:n_dev], dp=n_dev, sp=1)
    lanes = lanes_per_dev * n_dev
    px = jnp.arange(lanes, dtype=jnp.int32) % (cfg.width * cfg.height)
    target = jnp.zeros((lanes, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    fn = jax.jit(
        lambda k: sharded_loss_and_grad(scene, tables, cfg, mesh, k, px, target, spp)
    )

    def step(state, i):
        loss_prev = state[0]
        tok = (loss_prev * 1e-30).astype(jnp.int32)
        return fn(jax.random.fold_in(jax.random.fold_in(key, i), tok))

    rays = float(lanes) * spp * (2 * cfg.max_depth - 1)
    dt = timeit_chained(f"dp={n_dev} ({lanes} lanes)", step, step((jnp.float32(0.0),), 0),
                        K=8, rtt=rtt, rays=rays)
    return rays / dt / 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default=None)
    ap.add_argument("--lanes-per-dev", type=int, default=4096)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--scene", default="cornell-srgb")
    ap.add_argument("--mode", default="mallett")
    args = ap.parse_args()

    cfg = RenderConfig(scene=args.scene, mode=args.mode, width=512, height=512, spp=64)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    rtt = measure_rtt()
    n = len(jax.devices())
    sizes = [k for k in (1, 2, 4, 8, 16, 32) if k <= n]

    rows = []
    for k in sizes:
        mrays = bench_mesh(cfg, scene, tables, k, args.lanes_per_dev, args.spp, rtt)
        rows.append({"devices": k, "mrays_per_s": round(mrays, 2)})
    base = rows[0]["mrays_per_s"]
    for r in rows:
        r["efficiency"] = round(r["mrays_per_s"] / (r["devices"] * base), 4)
        print(f"dp={r['devices']:3d}  {r['mrays_per_s']:10.2f} Mrays/s  "
              f"eff {r['efficiency']*100:6.1f}%", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"backend": jax.default_backend(),
                       "device": str(jax.devices()[0]),
                       "lanes_per_dev": args.lanes_per_dev, "spp": args.spp,
                       "results": rows}, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
