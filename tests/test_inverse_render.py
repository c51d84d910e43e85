"""End-to-end inverse rendering: gradient descent on the render loss
recovers a perturbed scene parameter (round-3 verdict item 8).

Finite-difference checks (tests/test_gradients.py) prove the gradients
CORRECT; this proves them USABLE: the north star's "differentiable" clause
as a working demo.  The target image and the optimization renders share one
RNG key, so the loss is a deterministic function of the parameters and the
run is reproducible.
"""

import jax
import jax.numpy as jnp
import numpy as np

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.trainstep import (
    forward_backward_step,
    material_params,
)
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.scene.types import SceneData
from simple_spectral_tpu.spectra.colorimetry import build_color_tables
from simple_spectral_tpu.render.integrator import trace_lanes


def _render_target(scene, tables, cfg, key, px):
    px_i = px % cfg.width
    px_j = px // cfg.width
    keys = jax.random.split(key, cfg.spp)
    acc = jnp.zeros((px.shape[0], 3), jnp.float32)
    for i in range(cfg.spp):
        acc = acc + trace_lanes(scene, tables, cfg, keys[i], px_i, px_j).value
    return acc / cfg.spp


def test_recover_emission_by_gradient_descent():
    """Perturb the cornell light's emission spectrum to 0.25x and recover it
    by Adam on the L2 image loss: loss drops >= 10x within 50 steps and the
    recovered emission scale lands near 1."""
    import dataclasses

    import optax

    cfg = RenderConfig(
        scene="cornell", mode="mallett", width=8, height=8, spp=2, max_depth=3
    )
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    px = jnp.arange(cfg.width * cfg.height, dtype=jnp.int32)
    key = jax.random.PRNGKey(7)

    target = _render_target(scene, tables, cfg, key, px)
    assert float(jnp.abs(target).max()) > 0.0

    true_emission = np.asarray(scene.materials.emission_values)
    perturbed = dataclasses.replace(
        scene,
        materials=dataclasses.replace(
            scene.materials,
            emission_values=jnp.asarray(true_emission * 0.25),
        ),
    )

    params = material_params(perturbed)
    opt = optax.adam(learning_rate=0.1)
    state = opt.init(params)
    # Adam's updates are O(lr) regardless of gradient scale, but the leaves
    # live on very different scales (emission O(100), albedo O(1)); scale
    # each leaf's UPDATE by the true parameter magnitude so 50 steps can
    # cross the 0.25x -> 1x emission gap
    upd_scale = {
        f: jnp.maximum(jnp.abs(material_params(scene)[f]).max(), 1.0)
        for f in params
    }
    scene_opt = perturbed
    loss0 = None
    loss = None
    for step in range(50):
        loss, grads = forward_backward_step(
            scene_opt, tables, cfg, key, px, target, cfg.spp
        )
        if loss0 is None:
            loss0 = float(loss)
        updates, state = opt.update(grads, state)
        updates = {f: u * upd_scale[f] for f, u in updates.items()}
        params = optax.apply_updates(params, updates)
        scene_opt = dataclasses.replace(
            scene_opt,
            materials=dataclasses.replace(scene_opt.materials, **params),
        )
    final = float(loss)
    assert final < loss0 / 10.0, f"loss {loss0:.4g} -> {final:.4g} (< 10x)"

    # the light's recovered emission is close to truth where truth is nonzero
    rec = np.asarray(params["emission_values"])
    light_row = np.abs(true_emission).sum(axis=1).argmax()
    t_row = true_emission[light_row]
    nz = t_row > t_row.max() * 0.05
    ratio = rec[light_row][nz] / t_row[nz]
    assert 0.7 < ratio.mean() < 1.3, f"recovered scale {ratio.mean():.3f}"
