"""Weak-scaling efficiency of the sharded forward+backward step.

Implements the protocol documented in parallel/multihost.py: per-chip lane
count held constant while the dp mesh grows 1 -> 2 -> 4 -> ... over the
available devices; efficiency(K) = Mrays/s(K) / (K * Mrays/s(1)).

On the CPU host this exercises the sharding path over the virtual device
mesh (functional check + relative numbers; absolute Mrays/s are meaningless
on CPU).  On a TPU slice it produces the BASELINE scaling-efficiency metric
(target: >= 85% at 2+ hosts).  Multi-host runs launch one process per host
with --coordinator/--num-processes/--process-id before any jax use.

IMPORTANT caveat for virtual-CPU runs (round-4 analysis of the round-3
49%-at-8-devices reading): N virtual devices share the host's physical
cores, so weak scaling on a 2-core host is bounded by ~2/N once N > 2 --
the headline "efficiency" column mixes that host-core bound with any real
sharding overhead and CANNOT be compared against the >= 85% TPU target.
The ``--equal-work`` mode separates the two: it times the SAME total lane
count once on a 1-device mesh and once sharded over all N virtual devices
(both runs use every host core via XLA's intra-op threading), so their
ratio isolates the overhead the sharded program itself adds (psum,
partitioning, per-shard RNG) from raw compute throughput.

NOTE (this image): the sitecustomize forces the axon TPU backend and the
JAX_PLATFORMS env var alone does NOT override it -- force the CPU mesh via
jax.config before running, e.g.:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "
  import jax; jax.config.update('jax_platforms','cpu'); import runpy, sys
  sys.argv=['x','out.json','--equal-work','--lanes-per-dev','8192']
  runpy.run_path('tools/scaling_bench.py', run_name='__main__')"

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_bench.py [out.json] [--lanes-per-dev 4096] [--spp 4]
  ... --equal-work    # sharding-overhead mode (see above)
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
    ap.add_argument("--equal-work", action="store_true",
                    help="sharding-overhead mode: same TOTAL lanes on a "
                    "1-device mesh vs sharded over all devices (see module "
                    "docstring); the honest protocol on oversubscribed "
                    "virtual-CPU hosts")
    args = ap.parse_args()

    cfg = RenderConfig(scene=args.scene, mode=args.mode, width=512, height=512, spp=64)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    rtt = measure_rtt()
    n = len(jax.devices())

    if args.equal_work:
        total = args.lanes_per_dev * n
        m1 = bench_mesh(cfg, scene, tables, 1, total, args.spp, rtt)
        mn = bench_mesh(cfg, scene, tables, n, args.lanes_per_dev, args.spp, rtt)
        overhead = m1 / mn if mn else float("inf")
        rows = [
            {"devices": 1, "lanes": total, "mrays_per_s": round(m1, 3)},
            {"devices": n, "lanes": total, "mrays_per_s": round(mn, 3)},
        ]
        print(f"equal-work: 1-dev {m1:.3f} vs {n}-dev {mn:.3f} Mrays/s -> "
              f"sharded/single ratio {mn/m1:.3f} (1.0 = zero sharding overhead)",
              flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump({"backend": jax.default_backend(),
                           "device": str(jax.devices()[0]),
                           "protocol": "equal-work sharding overhead",
                           "total_lanes": total, "spp": args.spp,
                           "sharded_over_single": round(mn / m1, 4),
                           "results": rows}, f, indent=1)
            print(f"wrote {args.out}")
        return

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
