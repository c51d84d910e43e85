"""Intersection parity: vectorized watertight test vs an independent f64
Moller-Trumbore oracle (SURVEY.md section 7 stage 2: hit-distance/prim-id
parity on deterministic ray sets)."""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.intersect import intersect_rays
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


@pytest.fixture(scope="module")
def cornell():
    cfg = RenderConfig(scene="cornell", mode="rgb")
    tables = build_color_tables(cfg)
    return cfg, build_scene(cfg, tables)


def mt_intersect(tv, orig, dirs, ignore_prim, tri_prim, eps=1e-3):
    """Moller-Trumbore closest hit in float64; returns (dist[N], tri[N])."""
    v0, v1, v2 = tv[:, 0], tv[:, 1], tv[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    n_rays = orig.shape[0]
    best_d = np.full(n_rays, np.inf)
    best_t = np.full(n_rays, -1)
    for t in range(tv.shape[0]):
        p = np.cross(dirs, e2[t])
        det = p @ e1[t]
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        s = orig - v0[t]
        u = np.einsum("nd,nd->n", s, p) * inv
        q = np.cross(s, e1[t])
        v = np.einsum("nd,nd->n", q, dirs) * inv
        dist = (q @ e2[t]) * inv
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (dist >= eps) & (tri_prim[t] != ignore_prim)
        better = hit & (dist < best_d)
        best_d = np.where(better, dist, best_d)
        best_t = np.where(better, t, best_t)
    return best_d, best_t


def test_parity_with_f64_oracle(cornell, rng):
    cfg, scene = cornell
    tv = np.asarray(scene.tri_verts, np.float64)
    tri_prim = np.asarray(scene.tri_prim)
    n = 2000
    orig = rng.uniform([50, 50, 50], [500, 500, 500], (n, 3))
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    ignore = np.full(n, -1, np.int32)

    ref_d, ref_t = mt_intersect(tv, orig, dirs, ignore, tri_prim, eps=cfg.eps)
    rec = intersect_rays(
        scene,
        jnp.asarray(orig, jnp.float32),
        jnp.asarray(dirs, jnp.float32),
        jnp.asarray(ignore),
        cfg.eps,
    )
    got_d = np.asarray(rec.dist)
    got_t = np.asarray(rec.tri)
    got_hit = np.asarray(rec.hit)

    # The box's front side is open (no z=0 wall, reference src/scene.cpp has
    # no front quad), so a fraction of interior rays legitimately escape;
    # what matters is agreement with the f64 oracle on hit/miss.
    ref_hit = np.isfinite(ref_d)
    assert (got_hit == ref_hit).mean() > 0.999
    both = got_hit & ref_hit
    d_agree = np.abs(got_d[both] - ref_d[both]) < 1e-2 * np.maximum(ref_d[both], 1.0)
    assert d_agree.mean() > 0.995, f"distance agreement only {d_agree.mean()}"
    # Same primitive (quads may resolve to either of their two triangles on
    # the shared diagonal; compare prim ids).
    prim_match = np.asarray(scene.tri_prim)[got_t[both]] == tri_prim[ref_t[both]]
    assert prim_match.mean() > 0.995


def test_ignore_prim_excluded(cornell):
    cfg, scene = cornell
    # Ray from the center of the floor straight down: floor is prim 0; with
    # ignore=0 it must miss it (nothing below the floor).
    orig = jnp.asarray([[275.0, 0.0, 275.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    rec = intersect_rays(scene, orig, dirs, jnp.asarray([-1], jnp.int32), cfg.eps)
    # self-hit is below EPS distance so it misses even without ignore
    rec2 = intersect_rays(scene, orig, dirs, jnp.asarray([0], jnp.int32), cfg.eps)
    assert not bool(rec2.hit[0])


def test_closest_hit_and_normal(cornell):
    cfg, scene = cornell
    # From the camera position toward the back wall center: first hit should
    # be one of the blocks or the back wall, with a sane distance.
    orig = jnp.asarray([[278.0, 273.0, -800.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    rec = intersect_rays(scene, orig, dirs, jnp.asarray([-1], jnp.int32), cfg.eps)
    assert bool(rec.hit[0])
    d = float(rec.dist[0])
    assert 800.0 < d < 800.0 + 559.2 + 1.0
    # hit the tall block front face or the back wall; either way the normal
    # faces back toward -z.
    assert float(rec.normal.z[0]) < 0.0 or abs(d - (800.0 + 559.2)) < 1.0


def test_quad_diagonal_watertight(cornell):
    cfg, scene = cornell
    # Rays aimed exactly at points on the floor quad's diagonal must hit.
    # floor quad verts: (552.8,0,0), (0,0,0), (0,0,559.2), (549.6,0,559.2);
    # diagonal of the two tris is (552.8,0,0)-(0,0,559.2).
    # stay near the (552.8,0,0) end of the diagonal: the region x>460, z<90
    # has unobstructed sight lines (blocks live at x<=290 or z>=247).
    t = np.linspace(0.02, 0.15, 64)
    pts = (1 - t)[:, None] * np.array([552.8, 0, 0]) + t[:, None] * np.array([0, 0, 559.2])
    orig = pts + np.array([0.5, 50.0, 0.5])
    dirs = pts - orig
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    rec = intersect_rays(
        scene,
        jnp.asarray(orig, jnp.float32),
        jnp.asarray(dirs, jnp.float32),
        jnp.full((64,), -1, jnp.int32),
        cfg.eps,
    )
    assert bool(np.all(np.asarray(rec.hit)))
    assert bool(np.all(np.asarray(scene.tri_prim)[np.asarray(rec.tri)] == 0))
