"""Bisect the S-scaled fixed backward cost (tools/ablation_r03.json BWD-iso
rows: ~45 ms/call of fwd+bwd is bounce-count-independent and collapses at
n_wavelengths=1).  Each row re-times the canonical no-texture step with ONE
spectral subgraph stubbed out (tool-only monkeypatching; the stubs break
semantics, not shapes), so row deltas attribute the cost.

Usage: python tools/bench_bwd_bisect.py [out.json]
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

import simple_spectral_tpu.render.integrator as integ
import simple_spectral_tpu.render.shading as shading
from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables
from tools.tpu_bench import measure_rtt, timeit_chained

N = 262144
SPP = 4
RESULTS = []

ORIG_XYZ = integ.specradflux_to_ciexyz_hero_soa
ORIG_PRE = shading.precompute_constant_spectra


def fake_xyz(tables, flux, lam0, n_wavelengths, lambda_step):
    s = jnp.sum(flux, axis=0)
    return jnp.stack([s, s, s])


def fake_precompute(scene, cfg, lam0):
    m = scene.materials
    n = lam0.shape[0]
    s_dim = cfg.n_wavelengths
    # keep the value -> cache dependency (grads must still flow) but as one
    # trivially cheap broadcastless mean per material
    a = jnp.mean(m.albedo_values, axis=1)[:, None, None]
    e = jnp.mean(m.emission_values, axis=1)[:, None, None]
    shape = (m.n_materials, s_dim, n)
    return {"albedo": jnp.broadcast_to(a, shape), "emission": jnp.broadcast_to(e, shape)}


def bench(label, rtt, cfg):
    # fresh jit per row (the monkeypatched globals are read at trace time)
    from simple_spectral_tpu.render.trainstep import _loss_fn, material_params

    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    lanes = min(cfg.width * cfg.height, cfg.max_lanes // SPP, N)
    px = jnp.arange(lanes, dtype=jnp.int32)
    tgt = jnp.zeros((lanes, 3), jnp.float32)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def step_fn(k):
        loss = _loss_fn(scene, tables, cfg, k, px, tgt, SPP, "none")
        return jax.value_and_grad(loss)(material_params(scene))

    def step(state, i):
        loss_prev = state[0]
        tok = (loss_prev * 1e-30).astype(jnp.int32)
        return step_fn(jax.random.fold_in(jax.random.fold_in(key, i), tok))

    try:
        dt = timeit_chained(label, step, step((jnp.float32(0.0),), 0), K=10,
                            rtt=rtt)
        RESULTS.append({"label": label, "ms_per_call": round(dt * 1e3, 3)})
    except Exception as e:  # noqa: BLE001
        RESULTS.append({"label": label, "error": repr(e)[:300]})
        print(f"{label}: FAILED {repr(e)[:200]}", flush=True)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else None
    rtt = measure_rtt()
    print(f"tunnel RTT: {rtt*1e3:.1f} ms", flush=True)
    cfg = RenderConfig(scene="cornell", mode="mallett", width=512, height=512,
                       spp=64)

    bench("baseline no-texture fwd+bwd", rtt, cfg)

    integ.specradflux_to_ciexyz_hero_soa = fake_xyz
    bench("XYZ estimator stubbed", rtt, cfg)
    integ.specradflux_to_ciexyz_hero_soa = ORIG_XYZ

    integ.precompute_constant_spectra = fake_precompute
    bench("precompute cache stubbed", rtt, cfg)
    integ.precompute_constant_spectra = ORIG_PRE

    integ.specradflux_to_ciexyz_hero_soa = fake_xyz
    integ.precompute_constant_spectra = fake_precompute
    bench("both stubbed", rtt, cfg)
    integ.specradflux_to_ciexyz_hero_soa = ORIG_XYZ
    integ.precompute_constant_spectra = ORIG_PRE

    # remat_cache off with the real cache: does the checkpoint around the
    # (now cheap) precompute force extra backward recompute of wg?
    bench("baseline, remat_cache=False", rtt, cfg.replace(remat_cache=False))

    if out:
        with open(out, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "rtt_s": rtt,
                       "spp": SPP, "results": RESULTS}, f, indent=1)
        print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
