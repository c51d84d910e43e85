"""BVH traversal + sphere primitive parity vs the brute-force dense sweep.

The dense [T, N] sweep (render/intersect.py) is the reference-proven oracle
(image parity vs the compiled C++ reference, tests/test_parity_reference.py);
the BVH arm (render/bvh.py) must agree with it everywhere, including the
sphere extension (dense sphere sweep vs traversal sphere test).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.bvh import build_bvh_arrays, intersect_rays_bvh
from simple_spectral_tpu.render.intersect import (
    intersect_rays_soa,
    resolve_intersect_impl,
)
from simple_spectral_tpu.render.vec import V3
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


def _stress_cfg(**kw):
    base = dict(
        scene="cornell-stress", mode="rgb", width=32, height=32, spp=2,
        max_depth=4, stress_boxes=60, stress_spheres=30, stress_materials=16,
    )
    base.update(kw)
    return RenderConfig(**base)


def _random_rays(rng, n, lo=(20.0, 20.0, 20.0), hi=(530.0, 530.0, 530.0)):
    o = rng.uniform(lo, hi, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = V3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
    dv = V3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
    return ov, dv


def _assert_rec_match(r_bvh, r_soa, n):
    hit_b = np.asarray(r_bvh.hit)
    hit_s = np.asarray(r_soa.hit)
    np.testing.assert_array_equal(hit_b, hit_s)
    m = hit_b
    # distances agree exactly up to closest-hit ties; compare tightly and
    # allow the tie set (same dist, different prim -- e.g. a quad's own
    # coplanar diagonal resolved differently) to differ at f32 rounding
    d_b = np.asarray(r_bvh.dist)[m]
    d_s = np.asarray(r_soa.dist)[m]
    np.testing.assert_allclose(d_b, d_s, rtol=2e-5, atol=1e-4)
    same_prim = np.asarray(r_bvh.prim)[m] == np.asarray(r_soa.prim)[m]
    # ties are measure-zero for random rays; demand near-total agreement
    assert same_prim.mean() > 0.999, f"prim mismatch on {(~same_prim).sum()}/{m.sum()}"
    np.testing.assert_array_equal(
        np.asarray(r_bvh.mat)[m][same_prim], np.asarray(r_soa.mat)[m][same_prim]
    )
    for a_b, a_s in (
        (r_bvh.normal.x, r_soa.normal.x),
        (r_bvh.normal.y, r_soa.normal.y),
        (r_bvh.normal.z, r_soa.normal.z),
        (r_bvh.st_s, r_soa.st_s),
        (r_bvh.st_t, r_soa.st_t),
    ):
        np.testing.assert_allclose(
            np.asarray(a_b)[m][same_prim], np.asarray(a_s)[m][same_prim],
            rtol=1e-5, atol=1e-5,
        )


def test_bvh_matches_dense_sweep_cornell():
    """Force a BVH onto plain cornell (38 tris) and check agreement."""
    rng = np.random.default_rng(2424)  # local: order-independent draws
    cfg = RenderConfig(scene="cornell", mode="rgb", intersect_impl="bvh")
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    assert scene.bvh_nodes is not None and scene.n_bvh_entries > 38
    o, d = _random_rays(rng, 512)
    ignore = jnp.full((512,), -1, jnp.int32)
    r_bvh = jax.jit(lambda: intersect_rays_bvh(scene, o, d, ignore, cfg.eps))()
    r_soa = jax.jit(lambda: intersect_rays_soa(scene, o, d, ignore, cfg.eps))()
    # most rays hit (the cornell box is open on the camera side, so some
    # escape through the missing front wall)
    assert np.asarray(r_bvh.hit).mean() > 0.7
    _assert_rec_match(r_bvh, r_soa, 512)


def test_bvh_matches_dense_sweep_stress():
    """Stress scene (boxes + spheres): traversal vs dense sweep, with and
    without attribute recovery, plus the ignore-prim exclusion."""
    rng = np.random.default_rng(2424)  # local: order-independent draws
    cfg = _stress_cfg()
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    assert scene.n_spheres == 30 and scene.bvh_nodes is not None
    # below CULL_AUTO_THRESHOLD primitives auto stays on the dense sweep;
    # past it auto routes to the block-cull arm -- measured decision
    # (tools/stress_render_r04.json; see resolve_intersect_impl docstring)
    assert resolve_intersect_impl("auto", scene) == "xla"
    n = 768
    o, d = _random_rays(rng, n)
    ignore = jnp.asarray(rng.integers(-1, scene.n_prims, size=n), jnp.int32)
    r_bvh = jax.jit(lambda: intersect_rays_bvh(scene, o, d, ignore, cfg.eps))()
    r_soa = jax.jit(lambda: intersect_rays_soa(scene, o, d, ignore, cfg.eps))()
    _assert_rec_match(r_bvh, r_soa, n)
    # the winner respects the ignore exclusion
    m = np.asarray(r_bvh.hit)
    assert not np.any(np.asarray(r_bvh.prim)[m] == np.asarray(ignore)[m])
    # sphere hits actually occur in this scene (normals off the flat set)
    r2 = jax.jit(
        lambda: intersect_rays_bvh(scene, o, d, ignore, cfg.eps, need_attrs=False)
    )()
    np.testing.assert_array_equal(np.asarray(r2.hit), np.asarray(r_bvh.hit))
    # need_attrs=True recomputes the winner's exact distance from its row
    # (recover_hit_record), so it can drift from the raw traversal value by
    # f32 rounding
    np.testing.assert_allclose(
        np.asarray(r2.dist)[m], np.asarray(r_bvh.dist)[m], rtol=1e-5
    )


def test_sphere_hits_present():
    """The stress scene's spheres are actually hit by random rays (guards
    against a silently tri-only traversal)."""
    rng = np.random.default_rng(2424)  # local: order-independent draws
    cfg = _stress_cfg()
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    n = 2048
    o, d = _random_rays(rng, n)
    ignore = jnp.full((n,), -1, jnp.int32)
    rec = jax.jit(lambda: intersect_rays_bvh(scene, o, d, ignore, cfg.eps))()
    # identify sphere hits geometrically: hit point on some sphere surface
    hits = np.asarray(rec.hit)
    hp = np.stack(
        [
            np.asarray(o.x + rec.dist * d.x),
            np.asarray(o.y + rec.dist * d.y),
            np.asarray(o.z + rec.dist * d.z),
        ],
        axis=1,
    )[hits]
    centers = np.asarray(scene.sphere_center)
    radii = np.asarray(scene.sphere_radius)
    dist_to_sph = np.abs(
        np.linalg.norm(hp[:, None, :] - centers[None], axis=-1) - radii[None]
    ).min(axis=1)
    assert (dist_to_sph < 1e-3).sum() > 10, "no sphere surface hits found"


def test_render_bvh_matches_xla_stress():
    """End-to-end: the full render of the stress scene under the BVH arm
    equals the dense sweep bitwise-close (same RNG stream, same estimate)."""
    from simple_spectral_tpu.render.renderer import render_accumulate

    cfg = _stress_cfg(width=24, height=24, spp=2, max_depth=3)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    v1, a1 = render_accumulate(cfg.replace(intersect_impl="xla"), scene, tables, seed=3)
    v2, a2 = render_accumulate(cfg.replace(intersect_impl="bvh"), scene, tables, seed=3)
    np.testing.assert_allclose(v1, v2, rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(a1, a2)


def test_render_bvh_spectral_smoke():
    """Spectral mallett render of the stress scene under auto (=bvh): runs,
    finite, nonzero."""
    from simple_spectral_tpu.render.renderer import render_accumulate

    cfg = _stress_cfg(mode="mallett", width=12, height=12, spp=1, max_depth=3)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    v, a = render_accumulate(cfg, scene, tables, seed=0)
    assert np.isfinite(v).all() and v.max() > 0.0
    assert 0.0 <= a.min() and a.max() <= 1.0


def test_bvh_build_structure():
    """Host-built arrays are structurally sound: every skip strictly
    increases, prim entries cover every primitive exactly once, internal
    AABBs contain their subtrees."""
    cfg = _stress_cfg()
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    nodes = np.asarray(scene.bvh_nodes)
    nodes_i = nodes.view(np.int32)
    kind = nodes_i[:, 0]
    skip = nodes_i[:, 1]
    nn = scene.n_bvh_entries
    idx = np.arange(nn)
    assert (skip > idx).all() and (skip <= nn).all()
    ref = np.asarray(scene.bvh_entry_ref)
    tri_refs = np.sort(ref[kind == 1])
    np.testing.assert_array_equal(tri_refs, np.arange(scene.n_tris))
    sph_refs = np.sort(ref[kind == 2])
    np.testing.assert_array_equal(sph_refs, np.arange(scene.n_spheres))
    # spot-check containment: each tri's verts inside the root AABB
    root_mn, root_mx = nodes[0, 2:5], nodes[0, 5:8]
    tv = np.asarray(scene.tri_verts).reshape(-1, 3)
    assert (tv >= root_mn - 1e-3).all() and (tv <= root_mx + 1e-3).all()


def test_sphere_light_joins_light_list():
    """Emissive spheres join the NEE light list (round 5; cone-cap sampling
    -- full coverage in tests/test_sphere_lights.py)."""
    from simple_spectral_tpu.scene.library import _cornell_builder

    cfg = RenderConfig(scene="cornell", mode="rgb")
    tables = build_color_tables(cfg)
    b = _cornell_builder(cfg, tables)
    b.add_sphere(b.mat_names["light"], (275.0, 275.0, 275.0), 30.0)
    s = b.finish("with-sphere-light")
    assert s.n_sphere_lights == 1
    kinds = np.asarray(s.light_kind)
    assert kinds[-1] == 1 and np.asarray(s.light_sph)[-1, 3] == 30.0


def test_gradients_flow_through_bvh_scene():
    """Differentiable path on the BVH arm: material gradients are finite and
    nonzero on the stress scene (the while_loop carries no tangents)."""
    from simple_spectral_tpu.render.trainstep import forward_backward_step

    cfg = _stress_cfg(mode="mallett", width=8, height=8, spp=1, max_depth=3)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    px = jnp.arange(64, dtype=jnp.int32)
    target = jnp.zeros((64, 3), jnp.float32)
    loss, grads = forward_backward_step(
        scene, tables, cfg, jax.random.PRNGKey(0), px, target, 1
    )
    assert np.isfinite(float(loss)) and float(loss) > 0.0
    g = np.asarray(grads["emission_values"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0.0
