"""Round-4 texel-row packing micro-bench (round-3 verdict item 2).

jakob gathers f32[T, 3] rows (sigmoid coefficients), meng f32[T, 12] rows
(6 point ids + 6 weights); mallett's single u32 gather costs 7.2 ns/index
(tools/gather2_r03.json) and u16/u8 are NOT cheaper, so the packing lever
is fewer/narrower ROWS, not narrower elements.  Measures the candidate
layouts end-to-end (gather + unpack to the same f32 values).

Usage: python tools/bench_pack_micro.py [out.json]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.tpu_bench import measure_rtt, timeit_chained

N = 262144
T = 262144  # 512^2 texels
RESULTS = []


def run(label, fn, idx, rtt, n_idx=N):
    @jax.jit
    def step(tok):
        out = fn(jnp.bitwise_xor(idx, tok))
        return (out * 1e-30).astype(jnp.int32)

    dt = timeit_chained(label, lambda s, i: step(s), jnp.int32(0), K=16,
                        rtt=rtt, quiet=True)
    RESULTS.append({"label": label, "ms": round(dt * 1e3, 3),
                    "ns_per_index": round(dt / n_idx * 1e9, 3)})
    print(f"{label:46s} {dt*1e3:8.2f} ms  {dt/n_idx*1e9:6.2f} ns/idx", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, T, N), jnp.int32)

    # --- jakob candidates: 3 f32 coefficients per texel ---
    rows3 = jnp.asarray(rng.normal(size=(T, 3)), jnp.float32)
    run("jakob f32[T,3] rows (current)",
        lambda ti: jnp.take(rows3, ti, axis=0).sum(), idx, rtt)

    # f16 pair-packed: 2 u32 words
    c16 = rows3.astype(jnp.float16)
    w0 = (jax.lax.bitcast_convert_type(c16[:, 0], jnp.uint16).astype(jnp.uint32)
          << 16) | jax.lax.bitcast_convert_type(c16[:, 1], jnp.uint16).astype(jnp.uint32)
    w1 = jax.lax.bitcast_convert_type(c16[:, 2], jnp.uint16).astype(jnp.uint32)
    packed2 = jnp.stack([w0, w1], axis=1)  # u32[T, 2]

    def fetch_packed2(ti):
        r = jnp.take(packed2, ti, axis=0)
        c0 = jax.lax.bitcast_convert_type(
            (r[:, 0] >> 16).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
        c1 = jax.lax.bitcast_convert_type(
            (r[:, 0] & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
        c2 = jax.lax.bitcast_convert_type(
            (r[:, 1] & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
        return (c0 + c1 + c2).sum()

    run("jakob u32[T,2] f16-packed rows", fetch_packed2, idx, rtt)

    # 2 separate 1-D u32 gathers
    w0c, w1c = w0, w1

    def fetch_two(ti):
        a = jnp.take(w0c, ti)
        b = jnp.take(w1c, ti)
        c0 = jax.lax.bitcast_convert_type(
            (a >> 16).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
        c1 = jax.lax.bitcast_convert_type(
            (a & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
        c2 = jax.lax.bitcast_convert_type(
            (b & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
        return (c0 + c1 + c2).sum()

    run("jakob 2x separate u32 takes", fetch_two, idx, rtt)

    # single u64-style: 3 f16 coeffs do not fit one u32; try bf16? 3x bf16
    # also does not fit.  Single u32 with shared-exponent 10/11/11 custom
    # float would fit but costs unpack ALU; skip unless 2-word is not enough.

    # --- meng candidates: 6 ids + 6 weights per texel ---
    rows12 = jnp.asarray(
        np.concatenate([rng.integers(0, 200, (T, 6)).astype(np.float32),
                        rng.random((T, 6), dtype=np.float32)], axis=1))
    run("meng f32[T,12] rows (current)",
        lambda ti: jnp.take(rows12, ti, axis=0).sum(), idx, rtt)

    ids = rows12[:, :6].astype(jnp.uint32)
    wts = rows12[:, 6:].astype(jnp.float16)
    packed6 = (ids << 16) | jax.lax.bitcast_convert_type(
        wts, jnp.uint16).astype(jnp.uint32)  # u32[T, 6]

    def fetch_packed6(ti):
        r = jnp.take(packed6, ti, axis=0)
        pid = (r >> 16).astype(jnp.int32)
        w = jax.lax.bitcast_convert_type(
            (r & 0xFFFF).astype(jnp.uint16), jnp.float16).astype(jnp.float32)
        return (pid.astype(jnp.float32) + w).sum()

    run("meng u32[T,6] (u16 id | f16 w) rows", fetch_packed6, idx, rtt)

    # 3-word layout: two slots per u32 pair is not possible (id+w = 32 bits
    # already); instead test f32[T,8] (4 ids packed 2-per-u32 + 6 f16 w in 3
    # words = 6 words) -- approximated by a [T,6]f32 row to size the width
    # effect alone
    rows6 = rows12[:, :6]
    run("width probe f32[T,6] rows",
        lambda ti: jnp.take(rows6, ti, axis=0).sum(), idx, rtt)
    rows2 = rows12[:, :2]
    run("width probe f32[T,2] rows",
        lambda ti: jnp.take(rows2, ti, axis=0).sum(), idx, rtt)
    rows1 = rows12[:, :1]
    run("width probe f32[T,1] rows",
        lambda ti: jnp.take(rows1, ti, axis=0).sum(), idx, rtt)
    run("width probe u32[T] 1-D (mallett baseline)",
        lambda ti: jnp.take(w0c, ti).astype(jnp.float32).sum(), idx, rtt)

    if out_path:
        with open(out_path, "w") as f:
            json.dump({"device": str(jax.devices()[0]),
                       "rtt_ms": round(rtt * 1e3, 2),
                       "n_indices": N, "table_rows": T,
                       "results": RESULTS}, f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
