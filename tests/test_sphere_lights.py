"""Sphere emissives + cone-cap NEE sampling (round 5; reference
src/util/random.cpp:51-99 is the published recipe -- the reference itself
never renders spheres, so the oracle is analytic + ELS-vs-brute-force
equivalence, the same strategy the reference documents for its mirror
variant (src/scene.cpp:346-355)."""

import jax
import jax.numpy as jnp
import numpy as np

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.sampling import TWO_PI, rand_toward_sphere
from simple_spectral_tpu.render.vec import V3
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


def _sphere_hit(o, d, c, r):
    """Analytic ray-sphere hit test (numpy)."""
    oc = o - c
    b = (oc * d).sum(-1)
    cq = (oc * oc).sum(-1) - r * r
    disc = b * b - cq
    return disc > 0.0


def test_cone_sampler_hits_and_area():
    n = 8192
    key = jax.random.PRNGKey(0)
    c = np.array([3.0, 7.0, -2.0])
    r = 1.5
    o = np.array([0.0, 0.0, 0.0])
    to_c = V3(*(jnp.full((n,), v, jnp.float32) for v in c))
    d, area = rand_toward_sphere(key, to_c, jnp.full((n,), np.float32(r)))
    d_np = np.stack([np.asarray(d.x), np.asarray(d.y), np.asarray(d.z)], -1)
    # unit directions, all hitting the sphere
    np.testing.assert_allclose(np.linalg.norm(d_np, axis=1), 1.0, atol=1e-5)
    assert _sphere_hit(o[None], d_np, c[None], r).all()
    # area = 2 pi (1 - sqrt(1 - (r/l)^2)) on the slightly shrunken sphere
    l = np.linalg.norm(c)
    x = (r * 0.99999) / l
    expect = 2.0 * np.pi * (1.0 - np.sqrt(1.0 - x * x))
    np.testing.assert_allclose(np.asarray(area), expect, rtol=1e-5)
    # cos(angle to axis) uniform on [cos theta, 1]: mean = (1 + cos theta)/2
    cosang = d_np @ (c / l)
    assert abs(cosang.mean() - (1.0 + np.sqrt(1.0 - x * x)) / 2.0) < 1e-4


def test_cone_sampler_inside_sphere():
    n = 4096
    key = jax.random.PRNGKey(1)
    to_c = V3(jnp.full((n,), 0.1), jnp.full((n,), 0.0), jnp.full((n,), 0.0))
    d, area = rand_toward_sphere(key, to_c, jnp.full((n,), 5.0))
    np.testing.assert_allclose(np.asarray(area), 2.0 * TWO_PI, rtol=1e-6)
    # uniform over the full sphere: mean direction ~ 0
    m = np.array([np.asarray(d.x).mean(), np.asarray(d.y).mean(),
                  np.asarray(d.z).mean()])
    assert np.abs(m).max() < 0.05


def _scene_cfg(**kw):
    base = dict(
        scene="cornell-stress", mode="rgb", width=8, height=8,
        max_depth=4, stress_boxes=0, stress_spheres=0,
        stress_sphere_lights=2,
    )
    base.update(kw)
    return RenderConfig(**base)


def test_sphere_lights_join_light_list():
    cfg = _scene_cfg()
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    assert scene.n_sphere_lights == 2
    kinds = np.asarray(scene.light_kind)
    assert kinds.sum() == 2 and kinds[:-2].sum() == 0
    sph = np.asarray(scene.light_sph)
    assert (sph[kinds == 1, 3] > 0).all() and (sph[kinds == 0] == 0).all()
    # sphere light prim ids point at actual emissive spheres
    prims = np.asarray(scene.light_prims)[kinds == 1]
    sp_prims = np.asarray(scene.sphere_prim)
    sp_mats = np.asarray(scene.sphere_mat)
    emissive_rgb = np.asarray(scene.materials.emission_rgb).sum(1) > 0
    for p in prims:
        si = int(np.nonzero(sp_prims == p)[0][0])
        assert emissive_rgb[sp_mats[si]]


def test_sphere_light_nee_matches_brute_force():
    """ELS on (cone-cap NEE) and ELS off (emission on random hits) must
    converge to the same image -- the estimator-equivalence oracle that
    validates the cap-area pdf end to end."""
    from simple_spectral_tpu.render.renderer import render_accumulate

    cfg_els = _scene_cfg(spp=256, els=True)
    tables = build_color_tables(cfg_els)
    scene = build_scene(cfg_els, tables)
    v_els, _ = render_accumulate(cfg_els, scene, tables, seed=11)
    # els=False halves the per-sample intersects -> cheaper samples; the
    # estimator is noisier, so compare image MEANS, not pixels
    cfg_bf = _scene_cfg(spp=1024, els=False)
    scene_bf = build_scene(cfg_bf, tables)
    v_bf, _ = render_accumulate(cfg_bf, scene_bf, tables, seed=12)
    m_els = v_els.mean(axis=(0, 1))
    m_bf = v_bf.mean(axis=(0, 1))
    rel = np.abs(m_els - m_bf) / np.maximum(np.abs(m_bf), 1e-9)
    assert rel.max() < 0.12, (m_els, m_bf)


def test_sphere_lights_under_cull_arm():
    """Sphere lights and the block-cull intersection arm compose: the same
    stress scene renders identically under the dense sweep and the cull
    kernel (interpreter mode on CPU; hardware parity for the kernel itself
    is asserted by tools/bench_cull_micro.py)."""
    from simple_spectral_tpu.render.renderer import render_accumulate

    cfg = _scene_cfg(spp=2, width=8, height=8, max_depth=3,
                     stress_boxes=30, stress_spheres=10, bvh_threshold=64)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    assert scene.n_sphere_lights == 2 and scene.cull_tiles is not None
    v1, a1 = render_accumulate(cfg.replace(intersect_impl="xla"), scene,
                               tables, seed=3)
    v2, a2 = render_accumulate(cfg.replace(intersect_impl="cull"), scene,
                               tables, seed=3)
    np.testing.assert_allclose(v1, v2, rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(a1, a2)
