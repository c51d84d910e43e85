"""Round-3 gather attack: can the ~7 ns/index XLA texture gather be beaten?

tools/ablation_r03.json pins the canonical config's gap to the texture
branch (~91 ms of the 177 ms forward step), and bench_gather_micro.py showed
the bare u32 gathers are the cost (barrier-insensitive, pow-gamma hidden).
Two remaining attack lines, both measured here:

1. INDEX DISTRIBUTION: the integrator gathers a texel for EVERY hit, but in
   cornell-srgb only the left wall is textured -- if the hardware/lowering
   rewards repeated or coherent indices, masking untextured lanes to texel 0
   is a semantics-free win (the gathered value is discarded by the
   is_textured where).
2. PALLAS VMEM KERNEL: the 512^2 texture is 1 MB -- it fits VMEM whole.  A
   Mosaic kernel gathering from a VMEM-resident table may beat the XLA
   gather's HBM path (if Mosaic lowers vector-index jnp.take at all).

Usage: python tools/bench_gather2.py [out.json]
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_bench import measure_rtt, timeit_chained

N = 262144
D = 9
T = 262144
RESULTS = []


def record(label, dt):
    ns_per_idx = dt / (D * N) * 1e9
    RESULTS.append({"label": label, "ms": round(dt * 1e3, 3),
                    "ns_per_index": round(ns_per_idx, 3)})


def run(label, fn, idx):
    @jax.jit
    def body(tok):
        acc = jnp.float32(0.0)
        for k in range(D):
            acc = acc + fn(jnp.bitwise_xor(idx[k], tok))
        return (acc * 1e-30).astype(jnp.int32)

    dt = timeit_chained(label, lambda s, i: body(s), jnp.int32(0), K=12,
                        rtt=RTT)
    record(label, dt)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    key = jax.random.PRNGKey(0)
    tex = jax.random.randint(key, (T,), 0, 1 << 24, jnp.uint32)

    k1, k2, k3 = jax.random.split(key, 3)
    idx_rand = jax.random.randint(k1, (D, N), 0, T, jnp.int32)
    idx_zero = jnp.zeros((D, N), jnp.int32)
    mask20 = jax.random.uniform(k2, (D, N)) < 0.2
    idx_mix = jnp.where(mask20, idx_rand, 0)
    # spatially coherent: a slowly-varying base + small wiggle (neighboring
    # lanes hit neighboring texels, the real first-bounce pattern)
    base = (jnp.arange(N, dtype=jnp.int32) // 64) * 64
    wig = jax.random.randint(k3, (D, N), 0, 64, jnp.int32)
    idx_coh = (base[None, :] + wig) % T

    take = lambda ti: jnp.take(tex, ti, axis=0).astype(jnp.float32).sum()
    run("u32 take, random idx", take, idx_rand)
    run("u32 take, all-zero idx", take, idx_zero)
    run("u32 take, 20% random / 80% zero", take, idx_mix)
    run("u32 take, coherent idx", take, idx_coh)

    # table size sweep: does a smaller table gather faster?
    for tbits in (10, 14, 18):
        tt = tex[: 1 << tbits]
        run(f"u32 take, random idx, table 2^{tbits}",
            lambda ti, tt=tt, tb=tbits: jnp.take(tt, ti >> (18 - tb), axis=0)
            .astype(jnp.float32).sum(), idx_rand)

    # pallas VMEM gather attempts
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        BLK = 2048

        def gk(tbl_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take(tbl_ref[:].reshape(-1),
                                  idx_ref[:], axis=0).reshape(out_ref.shape)

        @jax.jit
        def pallas_gather(ti):
            out = pl.pallas_call(
                gk,
                grid=(N // BLK,),
                in_specs=[
                    pl.BlockSpec((T // 128, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BLK,), lambda i: (i,),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BLK,), lambda i: (i,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
            )(tex.reshape(T // 128, 128), ti)
            return out.astype(jnp.float32).sum()

        # compile check once, then time
        pallas_gather(idx_rand[0]).block_until_ready()
        run("PALLAS vmem take, random idx", pallas_gather, idx_rand)
    except Exception as e:  # noqa: BLE001
        msg = repr(e)[:400]
        print(f"pallas take: FAILED {msg}", flush=True)
        RESULTS.append({"label": "PALLAS vmem take", "error": msg})

    if out_path:
        with open(out_path, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "rtt_s": RTT,
                       "n": N, "d": D, "t": T, "results": RESULTS}, f, indent=1)
        print(f"wrote {out_path}", flush=True)


RTT = measure_rtt()
print(f"tunnel RTT: {RTT*1e3:.1f} ms", flush=True)

if __name__ == "__main__":
    main()
