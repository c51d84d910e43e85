"""Per-entry finite-difference validation of material gradients.

BASELINE's gradient target is "match finite differences" (BASELINE.md:22);
the differentiable leaves are the material tables (SURVEY.md C7: albedo /
emission spectra in spectral modes, RGB triples in rgb mode).  The render
estimator is deterministic for a fixed RNG key -- path geometry does not
depend on the material tables (hits, NEE directions and BSDF directions are
sampled from geometry + RNG only; material values scale throughputs) -- so
central finite differences of the SAME-seed objective converge to the AD
gradient without Monte-Carlo noise in the comparison.

Strategy per (mode, scene, leaf): take the AD gradient of a scalar objective
(sum of lane values), pick the highest-|grad| entries plus a couple of
mid-magnitude ones, and FD-check each with a relative central step in f32.
Tolerances account for f32 rounding of an O(1e-2)-step quotient.

Covers VERDICT round-1 item 4: per-entry checks on albedo_values and
emission_values (cornell const-albedo + cornell-srgb textured, where
gradients flow through the hat-weight contraction, texture deferred
factoring, and NEE), and the BASELINE config-4 plane-srgb + jakob
pixel-gradient check.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.integrator import trace_lanes
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


def _setup(mode, scene_name, w=6, h=6, spp=2, max_depth=4):
    cfg = RenderConfig(scene=scene_name, mode=mode, width=w, height=h, spp=spp,
                       max_depth=max_depth)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    px = jnp.arange(w * h, dtype=jnp.int32)
    return cfg, tables, scene, px % w, px // w


def _objective_fn(cfg, tables, scene, px_i, px_j, field, weight=None):
    """Scalar objective as a jitted function of one material leaf array.

    weight: optional f32[P, 3] selecting lanes/channels (None = sum all);
    spp keys are fixed so the objective is deterministic."""
    keys = jax.random.split(jax.random.PRNGKey(3), cfg.spp)

    @jax.jit
    def objective(arr):
        mats = dataclasses.replace(scene.materials, **{field: arr})
        s2 = dataclasses.replace(scene, materials=mats)
        total = jnp.float32(0.0)
        for k in keys:
            res = trace_lanes(s2, tables, cfg, k, px_i, px_j)
            v = res.value if weight is None else res.value * weight
            total = total + jnp.sum(v)
        return total

    return objective


def _fd_check(objective, arr, n_top=6, n_mid=2, rel_step=5e-3, rtol=0.02):
    """Compare AD gradient entries against central finite differences."""
    g = np.asarray(jax.grad(objective)(arr))
    assert np.isfinite(g).all()
    flat = np.abs(g).ravel()
    order = np.argsort(flat)[::-1]
    picks = list(order[:n_top])
    mids = order[: max(1, int((flat > 0).sum()))]
    if len(mids) > n_top + n_mid:
        picks += list(mids[len(mids) // 2 : len(mids) // 2 + n_mid])
    base = float(objective(arr))
    assert np.isfinite(base)

    checked = 0
    for idx_flat in picks:
        idx = np.unravel_index(idx_flat, g.shape)
        val = float(np.asarray(arr)[idx])
        h = max(abs(val), 0.05) * rel_step
        ap = jnp.asarray(np.asarray(arr)).at[idx].add(h)
        am = jnp.asarray(np.asarray(arr)).at[idx].add(-h)
        fd = (float(objective(ap)) - float(objective(am))) / (2 * h)
        ad = float(g[idx])
        # f32 objective ~O(100): cancellation noise floor for the quotient
        tol = rtol * max(abs(fd), abs(ad)) + max(abs(base), 1.0) * 3e-5 / h
        assert abs(ad - fd) <= tol, (idx, ad, fd, tol)
        checked += 1
    assert checked >= n_top
    return g


@pytest.mark.parametrize("mode", ["mallett", "meng", "jakob", "rgb"])
def test_albedo_gradients_fd_cornell(mode):
    """Per-entry d(sum XYZ)/d(albedo) on cornell: gradients flow through the
    BSDF throughput chain and NEE across all four color pipelines."""
    cfg, tables, scene, px_i, px_j = _setup(mode, "cornell")
    field = "albedo_values" if cfg.spectral else "albedo_rgb"
    obj = _objective_fn(cfg, tables, scene, px_i, px_j, field)
    g = _fd_check(obj, getattr(scene.materials, field))
    assert float(np.abs(g).max()) > 0.0


@pytest.mark.parametrize("mode", ["mallett", "rgb"])
def test_emission_gradients_fd_cornell(mode):
    cfg, tables, scene, px_i, px_j = _setup(mode, "cornell")
    field = "emission_values" if cfg.spectral else "emission_rgb"
    obj = _objective_fn(cfg, tables, scene, px_i, px_j, field)
    g = _fd_check(obj, getattr(scene.materials, field))
    assert float(np.abs(g).max()) > 0.0


def test_albedo_gradients_fd_cornell_srgb_textured():
    """cornell-srgb: the textured wall's radiance still depends on the other
    materials' albedo_values via interreflection; gradients must flow through
    the deferred per-texel upsample factoring without NaNs."""
    cfg, tables, scene, px_i, px_j = _setup("mallett", "cornell-srgb")
    obj = _objective_fn(cfg, tables, scene, px_i, px_j, "albedo_values")
    _fd_check(obj, scene.materials.albedo_values)


def test_plane_srgb_jakob_pixel_gradient():
    """BASELINE config 4: plane-srgb + Jakob-Hanika, gradient of a SINGLE
    pixel's XYZ sum w.r.t. albedo_values and emission_values vs FD."""
    cfg, tables, scene, px_i, px_j = _setup("jakob", "plane-srgb", w=4, h=4,
                                            spp=2, max_depth=4)
    n = px_i.shape[0]
    w = np.zeros((n, 3), np.float32)
    w[n // 2 + 1, :] = 1.0  # one interior pixel, all three XYZ channels
    weight = jnp.asarray(w)
    for field in ("albedo_values", "emission_values"):
        obj = _objective_fn(cfg, tables, scene, px_i, px_j, field, weight)
        g = _fd_check(obj, getattr(scene.materials, field), n_top=4)
        assert float(np.abs(g).max()) > 0.0, field
