"""Round-4: why does the in-context texel row gather cost 13.7 ms when the
isolated micro-bench measures 2.9 ms for the same [262144]-index gather from
the same f32[262144, 3] table?  (tools/modes_r04.json vs
tools/pack_micro_r04.json; xplane profile shows s32[1, N] T(1,128) copies
into memory space S(1) feeding each 13.7 ms gather fusion.)

Variants isolate the suspected triggers: index SOURCE (fresh vs sliced from
a scan-stacked [9, N] array), index layout laundering, uniform-index
fraction, and merging the 9 per-bounce gathers into one.

Usage: python tools/bench_ctx_gather.py [out.json]
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
T = 262144
D = 9
RESULTS = []


def run(label, fn, rtt, n_idx):
    @jax.jit
    def step(tok):
        out = fn(tok)
        return (out * 1e-30).astype(jnp.int32)

    dt = timeit_chained(label, lambda s, i: step(s), jnp.int32(0), K=16,
                        rtt=rtt, quiet=True)
    RESULTS.append({"label": label, "ms": round(dt * 1e3, 3),
                    "ns_per_index": round(dt / n_idx * 1e9, 3)})
    print(f"{label:52s} {dt*1e3:8.2f} ms  {dt/n_idx*1e9:6.2f} ns/idx", flush=True)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(T, 3)), jnp.float32)
    stack = jnp.asarray(rng.integers(0, T, (D, N)), jnp.int32)  # scan-like
    idx1 = jnp.asarray(rng.integers(0, T, N), jnp.int32)

    # A: fresh 1-D idx (isolated baseline)
    run("A row-gather, fresh [N] idx",
        lambda tok: jnp.take(table, jnp.bitwise_xor(idx1, tok), axis=0).sum(),
        rtt, N)

    # B: 9 gathers, idx sliced from the [9, N] stack (context mimic)
    def b(tok):
        s = jnp.bitwise_xor(stack, tok)
        acc = 0.0
        for k in range(D):
            acc = acc + jnp.take(table, s[k], axis=0).sum()
        return acc

    run("B 9x row-gather, idx = stack[k]", b, rtt, D * N)

    # C: like B but launder each index slice through reshape+barrier
    def c(tok):
        s = jnp.bitwise_xor(stack, tok)
        acc = 0.0
        for k in range(D):
            ik = jax.lax.optimization_barrier(s[k].reshape(N))
            acc = acc + jnp.take(table, ik, axis=0).sum()
        return acc

    run("C 9x row-gather, barrier-laundered idx", c, rtt, D * N)

    # D: one merged gather of all 9 bounces
    def d(tok):
        s = jnp.bitwise_xor(stack, tok).reshape(D * N)
        return jnp.take(table, s, axis=0).sum()

    run("D merged [9N] row-gather", d, rtt, D * N)

    # E: 9x 3-component 1-D takes from flattened table
    flat = table.reshape(-1)

    def e(tok):
        s = jnp.bitwise_xor(stack, tok)
        acc = 0.0
        for k in range(D):
            base = s[k] * 3
            acc = acc + (jnp.take(flat, base) + jnp.take(flat, base + 1)
                         + jnp.take(flat, base + 2)).sum()
        return acc

    run("E 9x 3-component 1-D takes", e, rtt, 3 * D * N)

    # F: 90% uniform-zero indices (masked-lane realism)
    mask = jnp.asarray(rng.random(N) < 0.1)

    def f(tok):
        s = jnp.bitwise_xor(stack, tok)
        acc = 0.0
        for k in range(D):
            ik = jnp.where(mask, s[k], 0)
            acc = acc + jnp.take(table, ik, axis=0).sum()
        return acc

    run("F 9x row-gather, 90% zeroed idx", f, rtt, D * N)

    # G: row-gather fed BY another fusion chain (tables through arithmetic)
    def g(tok):
        s = jnp.bitwise_xor(stack, tok)
        acc = 0.0
        for k in range(D):
            ik = jnp.clip(s[k] + tok, 0, T - 1)
            rows = jnp.take(table, ik, axis=0)
            acc = acc + (rows[:, 0] * 0.5 + rows[:, 1] + rows[:, 2]).sum()
        return acc

    run("G 9x row-gather + row arithmetic", g, rtt, D * N)

    if out_path:
        with open(out_path, "w") as fjson:
            json.dump({"device": str(jax.devices()[0]),
                       "rtt_ms": round(rtt * 1e3, 2), "results": RESULTS},
                      fjson, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
