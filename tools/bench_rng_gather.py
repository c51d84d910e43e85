"""Round-3 probe: (a) RNG impl cost in the real forward step, (b) remaining
gather variants (u16 / 2D / fixed-shape Pallas dynamic_gather).

The canonical forward is ~43.5 ms/spp of which ~22.7 ms is the texture
branch (tools/ablation_r03.json); the gather micro floor is ~7 ns/index.
Two candidate shaves to reach the 49.8 ms/spp fwd+bwd needed for
100 Mrays/s: cheaper per-lane RNG (threefry is pure VPU work; the TPU has a
hardware RngBitGenerator exposed via the 'rbg' impl) and any gather form
under 7 ns/index.

Usage: python tools/bench_rng_gather.py [out.json] [which]
  which: "rng" | "gather" | "all" (default "all") -- selects which probe
  family to run.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.tpu_bench import measure_rtt, timeit_chained

RESULTS = []


def record(label, dt, n_idx=None):
    row = {"label": label, "ms": round(dt * 1e3, 3)}
    if n_idx:
        row["ns_per_index"] = round(dt / n_idx * 1e9, 3)
    RESULTS.append(row)


def bench_forward(label, impl, rtt, spp_chunk=1):
    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.render.renderer import _render_chunk
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    cfg = RenderConfig(scene="cornell-srgb", mode="mallett", width=512,
                       height=512, spp=64)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    key = jax.random.key(0, impl=impl)
    n = 262144
    px = jnp.arange(n, dtype=jnp.int32)

    def step(state, i):
        tok = (state[0] * 1e-30).astype(jnp.int32)
        k = jax.random.fold_in(jax.random.fold_in(key, i), tok)
        out = _render_chunk(scene, tables, cfg, k, px, spp_chunk)
        return (out[0].sum(),)

    try:
        state0 = step((jnp.float32(0.0),), 0)
        dt = timeit_chained(label, step, state0, K=12, rtt=rtt)
        rays = n * spp_chunk * (2 * cfg.max_depth - 1)
        RESULTS.append({"label": label, "ms": round(dt * 1e3, 3),
                        "mrays_per_s": round(rays / dt / 1e6, 2)})
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {repr(e)[:300]}", flush=True)
        RESULTS.append({"label": label, "error": repr(e)[:300]})


def bench_gathers(rtt):
    N = 262144
    D = 8
    T = 262144
    key = jax.random.PRNGKey(0)
    tex = jax.random.randint(key, (T,), 0, 1 << 24, jnp.uint32)
    tex_np = np.asarray(tex)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (D, N), 0, T, jnp.int32)

    def run(label, fn):
        try:
            @jax.jit
            def body(tok):
                acc = jnp.float32(0.0)
                for k in range(D):
                    acc = acc + fn(jnp.bitwise_xor(idx[k], tok))
                return (acc * 1e-30).astype(jnp.int32)

            dt = timeit_chained(label, lambda s, i: body(s), jnp.int32(0),
                                K=12, rtt=rtt)
            record(label, dt, D * N)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {repr(e)[:300]}", flush=True)
            RESULTS.append({"label": label, "error": repr(e)[:300]})

    run("u32 take baseline",
        lambda ti: jnp.take(tex, ti, axis=0).astype(jnp.float32).sum())
    tex16 = (tex & 0xFFFF).astype(jnp.uint16)
    run("u16 take", lambda ti: jnp.take(tex16, ti, axis=0)
        .astype(jnp.float32).sum())
    tex8b = (tex & 0xFF).astype(jnp.uint8)
    run("u8 take", lambda ti: jnp.take(tex8b, ti, axis=0)
        .astype(jnp.float32).sum())
    tex2d = tex.reshape(512, 512)
    run("2D gather [512,512]",
        lambda ti: tex2d[(ti >> 9) & 511, ti & 511].astype(jnp.float32).sum())

    # Pallas dynamic_gather along lanes, shapes fixed (D=8 so D*N = 8*W*nb)
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        W = 65536
        tex8 = jnp.broadcast_to(tex[None, :], (8, T))

        def gk(tbl_ref, idx_ref, out_ref):
            out_ref[:] = jnp.take_along_axis(
                jnp.broadcast_to(tbl_ref[0:1, :], (8, T)),
                idx_ref[0], axis=1, mode="promise_in_bounds")[None]

        n_blocks = (D * N) // (8 * W)

        def pallas_gather_all(ti):
            flat = jnp.bitwise_and(ti.reshape(n_blocks, 8, W), T - 1)
            return pl.pallas_call(
                gk,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((1, T), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, W), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 8, W), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_blocks, 8, W), jnp.uint32),
            )(tex[None, :], flat)

        got = np.asarray(pallas_gather_all(idx)).reshape(-1)[:4096]
        want = tex_np[np.bitwise_and(np.asarray(idx).reshape(-1)[:4096], T - 1)]
        if not np.array_equal(got, want):
            nbad = int((got != want).sum())
            raise AssertionError(f"dynamic_gather WRONG ({nbad}/4096 bad)")

        @jax.jit
        def body(tok):
            out = pallas_gather_all(jnp.bitwise_xor(idx, tok))
            return (out.astype(jnp.float32).sum() * 1e-30).astype(jnp.int32)

        dt = timeit_chained("PALLAS dynamic_gather", lambda s, i: body(s),
                            jnp.int32(0), K=12, rtt=rtt)
        record("PALLAS dynamic_gather", dt, D * N)
    except Exception as e:  # noqa: BLE001
        # record the full traceback tail, not just repr(e): a bare
        # AssertionError() is undiagnosable from the artifact (advisor
        # round-3 item 4)
        import traceback

        tb = traceback.format_exc().strip().splitlines()[-6:]
        print(f"pallas: FAILED {repr(e)[:400]}", flush=True)
        RESULTS.append({"label": "PALLAS dynamic_gather",
                        "error": repr(e)[:400], "traceback_tail": tb})


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    rtt = measure_rtt()
    print(f"tunnel RTT: {rtt*1e3:.1f} ms", flush=True)
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    if which in ("rng", "all"):
        bench_forward("fwd canonical threefry", "threefry2x32", rtt)
        bench_forward("fwd canonical rbg", "rbg", rtt)
        bench_forward("fwd canonical unsafe_rbg", "unsafe_rbg", rtt)
    if which in ("gather", "all"):
        bench_gathers(rtt)
    if out_path:
        with open(out_path, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "rtt_s": rtt,
                       "results": RESULTS}, f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
