"""Gather attack, part 3: Mosaic dynamic_gather and XLA gather variants.

bench_gather2.py established: XLA take = ~7 ns/index for any non-uniform
index distribution, table size and coherence are irrelevant, and Pallas
rejects 1D jnp.take ("Only 2D gather is supported").  The 2D form Mosaic
DOES lower (jax lowering.py _gather_lowering_rule) is take_along_axis with
x.shape == idx.shape, which maps to tpu.dynamic_gather along sublanes or
lanes.  With the table broadcast across the 8 sublanes (x[i, j] = table[j],
8 x 1 MB = 8 MB VMEM), a lane-axis dynamic_gather out[i, j] = x[i, idx[i,j]]
IS the texture fetch -- if Mosaic supports it at this width and it is
correct across lane tiles.  Verified numerically here before timing.

Usage: python tools/bench_gather3.py [out.json]
"""

import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from tools.tpu_bench import measure_rtt, timeit_chained

N = 262144
D = 9
T = 262144
RESULTS = []


def run(label, fn, idx, rtt):
    """One timed row; failures recorded, never raised (an exception that
    kills the process mid-session can wedge the axon terminal for ~5 min)."""
    try:
        @jax.jit
        def body(tok):
            acc = jnp.float32(0.0)
            for k in range(D):
                acc = acc + fn(jnp.bitwise_xor(idx[k], tok))
            return (acc * 1e-30).astype(jnp.int32)

        dt = timeit_chained(label, lambda s, i: body(s), jnp.int32(0), K=12,
                            rtt=rtt)
        RESULTS.append({"label": label, "ms": round(dt * 1e3, 3),
                        "ns_per_index": round(dt / (D * N) * 1e9, 3)})
    except Exception as e:  # noqa: BLE001
        msg = repr(e)[:300]
        print(f"{label}: FAILED {msg}", flush=True)
        RESULTS.append({"label": label, "error": msg})


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rtt = measure_rtt()
    print(f"tunnel RTT: {rtt*1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)
    tex = jax.random.randint(key, (T,), 0, 1 << 24, jnp.uint32)
    tex_np = np.asarray(tex)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (D, N), 0, T, jnp.int32)

    # --- XLA variants ---
    run("take (clip mode, baseline)",
        lambda ti: jnp.take(tex, ti, axis=0).astype(jnp.float32).sum(), idx, rtt)
    run("take promise_in_bounds",
        lambda ti: tex.at[jnp.bitwise_and(ti, T - 1)]
        .get(mode="promise_in_bounds").astype(jnp.float32).sum(), idx, rtt)
    tex8 = jnp.broadcast_to(tex[None, :], (8, T))
    run("XLA take_along_axis lanes [8, N/8]",
        lambda ti: jnp.take_along_axis(
            tex8, jnp.bitwise_and(ti, T - 1).reshape(8, N // 8), axis=1,
            mode="promise_in_bounds").astype(jnp.float32).sum(), idx, rtt)
    tex2d = tex.reshape(512, 512)
    run("XLA 2D gather [512,512] (row, col) idx",
        lambda ti: tex2d[(ti >> 9) & 511, ti & 511].astype(jnp.float32).sum(),
        idx, rtt)
    tex16 = (tex & 0xFFFF).astype(jnp.uint16)
    run("u16 table take (byte-scaling probe)",
        lambda ti: jnp.take(tex16, ti, axis=0).astype(jnp.float32).sum(),
        idx, rtt)

    # --- Pallas dynamic_gather along lanes ---
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def gk(tbl_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(
                tbl_ref[:], idx_ref[:], axis=1, mode="promise_in_bounds")

        W = T  # x.shape == idx.shape required by the lowering rule
        n_blocks = (D * N) // (8 * W)

        def pallas_gather_all(ti):
            flat = jnp.bitwise_and(ti.reshape(n_blocks, 8, W), T - 1)
            out = pl.pallas_call(
                gk,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((8, W), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, W), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 8, W), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_blocks, 8, W), jnp.uint32),
            )(tex8, flat)
            return out

        # correctness first (small slice readback)
        got = np.asarray(pallas_gather_all(idx)).reshape(-1)[: 4096]
        want = tex_np[np.bitwise_and(np.asarray(idx).reshape(-1)[:4096], T - 1)]
        if not np.array_equal(got, want):
            nbad = int((got != want).sum())
            raise AssertionError(f"pallas dynamic_gather WRONG ({nbad}/4096 bad)")

        @jax.jit
        def body(tok):
            out = pallas_gather_all(jnp.bitwise_xor(idx, tok))
            return (out.astype(jnp.float32).sum() * 1e-30).astype(jnp.int32)

        dt = timeit_chained("PALLAS dynamic_gather lanes", lambda s, i: body(s),
                            jnp.int32(0), K=12, rtt=rtt)
        RESULTS.append({"label": "PALLAS dynamic_gather lanes",
                        "ms": round(dt * 1e3, 3),
                        "ns_per_index": round(dt / (D * N) * 1e9, 3)})
    except Exception as e:  # noqa: BLE001
        msg = repr(e)[:400]
        print(f"pallas dynamic_gather: FAILED {msg}", flush=True)
        RESULTS.append({"label": "PALLAS dynamic_gather lanes", "error": msg})

    if out_path:
        with open(out_path, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "rtt_s": rtt,
                       "results": RESULTS}, f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
