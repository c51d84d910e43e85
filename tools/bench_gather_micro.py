"""Which gather formulation is fast on this chip?

tools/bench_texture_micro.py showed the canonical config's texture cost is
the GATHER itself (9x [262144] u32 takes = 17 ms; the pow gamma is 1.1 ms),
at ~7 ns/index -- yet render/integrator.py's deferred-shading rationale
measured the same gather at ~7 us when it issues as a standalone kernel.
Hypothesis: XLA fuses the gather into its elementwise consumers, hitting the
slow scalar-load path; an optimization_barrier between the gather and its
consumers should recover the fast path.  This bench measures every variant.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.tpu_bench import measure_rtt, timeit_chained

N = 262144
D = 9
T = 262144


def main():
    rtt = measure_rtt()
    print(f"tunnel RTT: {rtt*1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)
    tex_u32 = jax.random.randint(key, (T,), 0, 1 << 24, jnp.uint32)
    tex_rows = jax.random.uniform(key, (T, 3), jnp.float32)
    tex_planar = jax.random.uniform(key, (3, T), jnp.float32)
    idx = jax.random.randint(key, (D, N), 0, T, jnp.int32)

    def run(label, fn):
        @jax.jit
        def body(tok):
            acc = jnp.float32(0.0)
            for k in range(D):
                acc = acc + fn(idx[k] + tok)
            return (acc * 1e-30).astype(jnp.int32)

        timeit_chained(label, lambda s, i: body(s), jnp.int32(0), K=12, rtt=rtt)

    bar = jax.lax.optimization_barrier

    run("u32 gather, fused sum       (9x)",
        lambda ti: jnp.take(tex_u32, ti, axis=0).astype(jnp.float32).sum())
    run("u32 gather, BARRIER, sum    (9x)",
        lambda ti: bar(jnp.take(tex_u32, ti, axis=0)).astype(jnp.float32).sum())
    run("rows [T,3] gather, fused    (9x)",
        lambda ti: jnp.take(tex_rows, ti, axis=0).sum())
    run("rows [T,3] gather, BARRIER  (9x)",
        lambda ti: bar(jnp.take(tex_rows, ti, axis=0)).sum())
    run("planar 3x[T] gather, BARRIER(9x)",
        lambda ti: sum(bar(jnp.take(tex_planar[c], ti, axis=0)).sum() for c in range(3)))

    # one big gather for all bounces at once
    @jax.jit
    def big(tok):
        rows = bar(jnp.take(tex_rows, idx.reshape(-1) + tok, axis=0))
        return (rows.sum() * 1e-30).astype(jnp.int32)

    timeit_chained("rows [T,3] ONE [9N] gather, BARRIER ", lambda s, i: big(s),
                   jnp.int32(0), K=12, rtt=rtt)

    # barrier'd gather feeding elementwise FMAs (the real phase-2 shape)
    bh = jax.random.uniform(key, (3, 4, N), jnp.float32)

    def fma(ti):
        rows = bar(jnp.take(tex_rows, ti, axis=0))
        v = (bh[0] * rows[:, 0][None, :] + bh[1] * rows[:, 1][None, :]
             + bh[2] * rows[:, 2][None, :])
        return v.sum()

    run("rows gather BARRIER + hero FMA (9x)", fma)


if __name__ == "__main__":
    main()
