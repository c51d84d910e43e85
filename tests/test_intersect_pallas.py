"""Parity of the Pallas closest-hit kernel against the XLA sweep.

Runs the kernel in interpret mode on the CPU mesh (pl.pallas_call
interpret=True); the same checks run compiled on real TPU hardware via
``python tools/check_pallas_tpu.py`` (recorded in its module docstring).
Oracle: intersect_rays_soa, itself validated against a float64
Moller-Trumbore oracle in tests/test_intersect.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.intersect import (
    intersect_rays_pallas,
    intersect_rays_soa,
    resolve_intersect_impl,
)
from simple_spectral_tpu.render.vec import V3
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


def _scene(name="cornell-srgb"):
    cfg = RenderConfig(scene=name, mode="rgb", width=8, height=8, spp=1)
    tables = build_color_tables(cfg)
    return build_scene(cfg, tables)


def _random_rays(scene, n, seed=0):
    """Origins jittered inside the scene bounds, random sphere directions."""
    rng = np.random.default_rng(seed)
    verts = np.asarray(scene.tri_verts).reshape(-1, 3)
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    o = rng.uniform(lo + 0.05 * (hi - lo), hi - 0.05 * (hi - lo), size=(n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = V3(*(jnp.asarray(o[:, a], jnp.float32) for a in range(3)))
    dv = V3(*(jnp.asarray(d[:, a], jnp.float32) for a in range(3)))
    return ov, dv


def assert_hit_parity(scene, o, d, ignore, eps=1e-3, interpret=True,
                      edge_flip_budget=0.0):
    """Shared oracle: pallas vs XLA HitRecords must agree.

    ``edge_flip_budget``: fraction of lanes allowed to disagree on ``hit``
    (rays grazing a triangle edge or |det| ~ eps flip under the MXU-vs-VPU
    op-order rounding difference; 0 observed in interpret mode, ~1e-3 on
    hardware).  Value comparisons run on the lanes where both agree.
    """
    ref = intersect_rays_soa(scene, o, d, ignore, eps)
    got = intersect_rays_pallas(scene, o, d, ignore, eps, interpret=interpret)

    hit_g, hit_r = np.asarray(got.hit), np.asarray(ref.hit)
    flip = (hit_g != hit_r).mean()
    assert flip <= edge_flip_budget, f"hit flips {flip:.2e} > {edge_flip_budget:.2e}"
    h = hit_r & hit_g
    # The winning primitive matches everywhere except key-quantization /
    # rounding near-ties; with MC ray sets the systematic ties are the
    # coplanar quad diagonals, where both triangles share prim/mat/normal --
    # so prim disagreement shares the edge-flip budget.
    prim_flip = (np.asarray(got.prim)[h] != np.asarray(ref.prim)[h])
    assert prim_flip.mean() <= edge_flip_budget, prim_flip.mean()
    h = h & (np.asarray(got.prim) == np.asarray(ref.prim))
    # Distances agree wherever the same primitive won (the recovery path
    # recomputes the exact watertight distance, so this is tight).
    np.testing.assert_allclose(
        np.asarray(got.dist)[h], np.asarray(ref.dist)[h], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got.mat)[h], np.asarray(ref.mat)[h])
    same_tri = np.asarray(got.tri)[h] == np.asarray(ref.tri)[h]
    for a in range(3):
        np.testing.assert_allclose(
            np.asarray(got.normal[a])[h], np.asarray(ref.normal[a])[h], atol=1e-6
        )
    # ST only comparable when the same triangle won (diagonal ties park the
    # hit on the other half's barycentrics; both are valid surface points).
    np.testing.assert_allclose(
        np.asarray(got.st_s)[h][same_tri], np.asarray(ref.st_s)[h][same_tri],
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got.st_t)[h][same_tri], np.asarray(ref.st_t)[h][same_tri],
        rtol=2e-4, atol=2e-4,
    )
    assert same_tri.mean() > 0.99

    # need_attrs=False path: hit/prim/mat identical, dist within quantization
    ref2 = intersect_rays_soa(scene, o, d, ignore, eps, need_attrs=False)
    got2 = intersect_rays_pallas(
        scene, o, d, ignore, eps, need_attrs=False, interpret=interpret
    )
    np.testing.assert_array_equal(np.asarray(got2.hit), np.asarray(ref2.hit))
    np.testing.assert_array_equal(np.asarray(got2.prim)[h], np.asarray(ref2.prim)[h])
    np.testing.assert_array_equal(np.asarray(got2.mat)[h], np.asarray(ref2.mat)[h])
    # quantized key distance + MXU-vs-elementwise rounding on near-grazing
    # hits (dist = t_scaled/det amplifies near |det| ~ eps) -> loose rtol;
    # nothing consumes this distance (shadow rays read only hit/prim/mat)
    np.testing.assert_allclose(
        np.asarray(got2.dist)[h], np.asarray(ref2.dist)[h], rtol=1e-3
    )


@pytest.mark.parametrize("scene_name", ["cornell", "cornell-srgb", "plane-srgb"])
def test_pallas_parity_random_rays(scene_name):
    scene = _scene(scene_name)
    o, d = _random_rays(scene, 4096, seed=7)
    ignore = jnp.full((4096,), -1, jnp.int32)
    assert_hit_parity(scene, o, d, ignore)


def test_pallas_parity_ignore_prim():
    """Self-hit exclusion: rays from a surface point with its prim ignored."""
    scene = _scene("cornell")
    n = 2048
    o, d = _random_rays(scene, n, seed=11)
    first = intersect_rays_soa(scene, o, d, jnp.full((n,), -1, jnp.int32), 1e-3)
    hp = o + jnp.where(jnp.isfinite(first.dist), first.dist, 0.0) * d
    _, d2 = _random_rays(scene, n, seed=12)
    assert_hit_parity(scene, hp, d2, first.prim)


def test_pallas_parity_nonmultiple_lane_count():
    """Lane counts that are not a multiple of the 2048 kernel block."""
    scene = _scene("cornell")
    for n in (1, 7, 130, 2049):
        o, d = _random_rays(scene, n, seed=n)
        ignore = jnp.full((n,), -1, jnp.int32)
        assert_hit_parity(scene, o, d, ignore)


def test_resolve_impl():
    assert resolve_intersect_impl("xla") == "xla"
    assert resolve_intersect_impl("pallas") == "pallas"
    # on the CPU test mesh, auto must fall back to xla
    assert resolve_intersect_impl("auto") == "xla"
