"""Block-cull intersection parity vs the brute-force dense sweep.

Runs the Pallas kernel in interpreter mode on the CPU test mesh (compiled
Mosaic is exercised on hardware by tools/bench_cull_micro.py); the dense
sweep is the reference-proven oracle, as for the BVH arm (tests/test_bvh.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.cull import build_cluster_arrays, intersect_rays_cull
from simple_spectral_tpu.render.intersect import intersect_rays_soa
from simple_spectral_tpu.render.vec import V3
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


def _stress_cfg(**kw):
    base = dict(
        scene="cornell-stress", mode="rgb", width=16, height=16, spp=1,
        max_depth=3, stress_boxes=40, stress_spheres=20, stress_materials=16,
        intersect_impl="cull",
    )
    base.update(kw)
    return RenderConfig(**base)


def _random_rays(rng, n):
    o = rng.uniform((20, 20, 20), (530, 530, 530), (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        V3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
        V3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
    )


def test_cluster_build_structure():
    cfg = _stress_cfg()
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    tiles = np.asarray(scene.cull_tiles)
    c, lp1, w = tiles.shape
    from simple_spectral_tpu.render.cull import TILE_W

    assert w == TILE_W and lp1 == cfg.cull_cluster_size + 1
    kinds = tiles.view(np.int32)[:, 1:, 0]
    n_prims = (kinds > 0).sum()
    assert n_prims == scene.n_tris + scene.n_spheres
    ref = np.asarray(scene.cull_entry_ref).reshape(c, lp1)
    # every primitive appears exactly once
    tri_refs = np.sort(ref[:, 1:][kinds == 1])
    np.testing.assert_array_equal(tri_refs, np.arange(scene.n_tris))
    # aabbs contain their prim rows' triangle vertices
    for ci in range(0, c, max(1, c // 8)):
        mn, mx = tiles[ci, 0, 2:5], tiles[ci, 0, 5:8]
        rows = tiles[ci, 1:][kinds[ci] == 1]
        if rows.size:
            verts = rows[:, 2:11].reshape(-1, 3)
            assert (verts >= mn - 1e-3).all() and (verts <= mx + 1e-3).all()


def test_cull_matches_dense_sweep():
    rng = np.random.default_rng(4242)  # local: order-independent draws
    cfg = _stress_cfg()
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    n = 1500  # spans 2 blocks incl. a padded tail
    o, d = _random_rays(rng, n)
    ignore = jnp.asarray(rng.integers(-1, scene.n_prims, size=n), jnp.int32)
    r_cull = intersect_rays_cull(scene, o, d, ignore, cfg.eps, interpret=True)
    r_soa = jax.jit(lambda: intersect_rays_soa(scene, o, d, ignore, cfg.eps))()
    hit_c = np.asarray(r_cull.hit)
    hit_s = np.asarray(r_soa.hit)
    np.testing.assert_array_equal(hit_c, hit_s)
    m = hit_c
    np.testing.assert_allclose(
        np.asarray(r_cull.dist)[m], np.asarray(r_soa.dist)[m], rtol=1e-5, atol=1e-3
    )
    same = np.asarray(r_cull.prim)[m] == np.asarray(r_soa.prim)[m]
    assert same.mean() > 0.995, f"prim mismatch {(~same).sum()}/{m.sum()}"
    np.testing.assert_array_equal(
        np.asarray(r_cull.mat)[m][same], np.asarray(r_soa.mat)[m][same]
    )
    for a, b in (
        (r_cull.normal.x, r_soa.normal.x),
        (r_cull.st_s, r_soa.st_s),
        (r_cull.st_t, r_soa.st_t),
    ):
        np.testing.assert_allclose(
            np.asarray(a)[m][same], np.asarray(b)[m][same], rtol=1e-4, atol=1e-4
        )
    # ignore exclusion respected
    assert not np.any(np.asarray(r_cull.prim)[m] == np.asarray(ignore)[m])


def test_cull_need_attrs_false():
    rng = np.random.default_rng(4242)  # local: order-independent draws
    cfg = _stress_cfg()
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    n = 512
    o, d = _random_rays(rng, n)
    ignore = jnp.full((n,), -1, jnp.int32)
    r1 = intersect_rays_cull(scene, o, d, ignore, cfg.eps, need_attrs=False,
                             interpret=True)
    r2 = intersect_rays_cull(scene, o, d, ignore, cfg.eps, interpret=True)
    np.testing.assert_array_equal(np.asarray(r1.hit), np.asarray(r2.hit))
    np.testing.assert_array_equal(np.asarray(r1.prim), np.asarray(r2.prim))


def test_render_cull_matches_xla():
    """End-to-end tiny render under the cull arm vs the dense sweep."""
    from simple_spectral_tpu.render.renderer import render_accumulate

    cfg = _stress_cfg(width=12, height=12, spp=1, max_depth=2)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    v1, a1 = render_accumulate(cfg.replace(intersect_impl="xla"), scene, tables, seed=3)
    v2, a2 = render_accumulate(cfg.replace(intersect_impl="cull"), scene, tables, seed=3)
    np.testing.assert_allclose(v1, v2, rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(a1, a2)


def test_cull_sorted_matches_unsorted():
    """Ray sorting is a pure reordering: sorted results equal unsorted."""
    rng = np.random.default_rng(4242)  # local: order-independent draws
    cfg = _stress_cfg()
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    n = 1500
    o, d = _random_rays(rng, n)
    ignore = jnp.asarray(rng.integers(-1, scene.n_prims, size=n), jnp.int32)
    r0 = intersect_rays_cull(scene, o, d, ignore, cfg.eps, interpret=True,
                             sort_rays=False)
    r1 = intersect_rays_cull(scene, o, d, ignore, cfg.eps, interpret=True,
                             sort_rays=True)
    np.testing.assert_array_equal(np.asarray(r0.hit), np.asarray(r1.hit))
    np.testing.assert_array_equal(np.asarray(r0.prim), np.asarray(r1.prim))
    m = np.asarray(r0.hit)
    np.testing.assert_allclose(
        np.asarray(r0.dist)[m], np.asarray(r1.dist)[m], rtol=1e-6
    )
