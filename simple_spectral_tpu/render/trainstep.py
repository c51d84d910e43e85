"""Single-device differentiable render step (forward + backward).

The unit the benchmark times and the multi-chip layer shards: render a batch
of pixel lanes, L2-compare against a target, and backpropagate to the
material tables (the framework's differentiable leaves, SURVEY.md C7).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.integrator import trace_lanes

DIFF_FIELDS = ("albedo_values", "emission_values", "albedo_rgb", "emission_rgb")


def material_params(scene):
    """Extract the differentiable material leaves as a flat dict."""
    return {f: getattr(scene.materials, f) for f in DIFF_FIELDS}


def with_material_params(scene, params):
    mats = dataclasses.replace(scene.materials, **params)
    return dataclasses.replace(scene, materials=mats)


def _loss_fn(scene, tables, cfg: RenderConfig, key, px_flat, target, spp: int, remat: str):
    """mean((render(px) - target)^2) as a function of the material params.

    remat selects the AD memory/recompute trade for the per-sample trace:
      - "none":  save residuals (phase-2 shading intermediates per sample)
      - "trace": jax.checkpoint each sample's whole trace -- backward re-runs
        the forward per sample; bounds residual memory at O(1) samples

    The spp samples run as an UNROLLED python loop, not a ``lax.scan``:
    transposing the scan for the backward pass forces every iteration's
    residuals through a materialized stack + loop-carried restore, which
    measured at ~2.1x the per-sample backward cost of straight-line code
    (tools/ablation_r03.json BWD-iso rows: 28.5 ms/sample inside the scan
    vs 13.4 ms/sample unrolled).  Residual MEMORY is identical (one trace's
    intermediates per sample either way); only compile time grows with spp,
    which callers already bound (spp per call is the host chunking knob).
    """
    px_i = px_flat % cfg.width
    px_j = px_flat // cfg.width

    trace = trace_lanes
    if remat == "trace":
        trace = jax.checkpoint(
            lambda s, t, k, pi, pj: trace_lanes(s, t, cfg, k, pi, pj)
        )
        trace_call = lambda s2, k: trace(s2, tables, k, px_i, px_j)
    else:
        trace_call = lambda s2, k: trace_lanes(s2, tables, cfg, k, px_i, px_j)

    def loss(params):
        s2 = with_material_params(scene, params)

        keys = jax.random.split(key, spp)
        sum_v = jnp.zeros((px_flat.shape[0], 3), jnp.float32)
        for i in range(spp):
            sum_v = sum_v + trace_call(s2, keys[i]).value
        mean_v = sum_v / spp
        return jnp.mean((mean_v - target) ** 2)

    return loss


@partial(jax.jit, static_argnums=(2, 6, 7))
def forward_backward_step(
    scene, tables, cfg: RenderConfig, key, px_flat, target, spp: int, remat: str = "none"
):
    """loss, grads = d/d(materials) mean((render(px) - target)^2).

    px_flat: i32[P]; target: f32[P, 3].  spp samples per pixel, averaged.
    """
    loss = _loss_fn(scene, tables, cfg, key, px_flat, target, spp, remat)
    return jax.value_and_grad(loss)(material_params(scene))


@partial(jax.jit, static_argnums=(2, 6, 7))
def forward_only_step(
    scene, tables, cfg: RenderConfig, key, px_flat, target, spp: int, remat: str = "none"
):
    """The same loss WITHOUT gradients -- the fwd half of the fwd/bwd split
    (tools/perf_ablate.py records both to size the backward sweep)."""
    loss = _loss_fn(scene, tables, cfg, key, px_flat, target, spp, remat)
    return loss(material_params(scene))
