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


@partial(jax.jit, static_argnums=(2, 6))
def forward_backward_step(scene, tables, cfg: RenderConfig, key, px_flat, target, spp: int):
    """loss, grads = d/d(materials) mean((render(px) - target)^2).

    px_flat: i32[P]; target: f32[P, 3].  spp samples per pixel, averaged.
    """
    px_i = px_flat % cfg.width
    px_j = px_flat // cfg.width
    params0 = material_params(scene)

    def loss_fn(params):
        s2 = with_material_params(scene, params)

        # NOTE on memory: AD residuals scale with spp (each scanned sample's
        # trace is held live for the backward sweep), so callers bound spp
        # per call and chunk on the host -- jax.checkpoint would trade the
        # memory for recompute, but remat'd scans currently send this
        # environment's AOT compiler into a tailspin, and host chunking
        # achieves the same peak-memory bound.
        def body(acc, k):
            res = trace_lanes(s2, tables, cfg, k, px_i, px_j)
            return acc + res.value, None

        keys = jax.random.split(key, spp)
        sum_v, _ = jax.lax.scan(body, jnp.zeros((px_flat.shape[0], 3), jnp.float32), keys)
        mean_v = sum_v / spp
        return jnp.mean((mean_v - target) ** 2)

    return jax.value_and_grad(loss_fn)(params0)
