"""Scene builders and camera factorization."""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.scene.types import make_camera, perspective_fov, look_at
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


@pytest.fixture(scope="module")
def tables():
    return build_color_tables(RenderConfig(mode="mallett"))


@pytest.fixture(scope="module")
def tables_rgb():
    return build_color_tables(RenderConfig(mode="rgb"))


def test_cornell_counts(tables):
    cfg = RenderConfig(scene="cornell", mode="mallett")
    s = build_scene(cfg, tables)
    # 19 quads = 38 triangles, 6 materials, 1 light (SURVEY.md section 2).
    assert s.n_prims == 19 and s.n_tris == 38
    assert s.materials.n_materials == 6
    assert s.n_lights == 1
    assert s.texture is None


def test_cornell_srgb_counts(tables):
    cfg = RenderConfig(scene="cornell-srgb", mode="mallett")
    s = build_scene(cfg, tables)
    assert s.n_prims == 19 and s.n_tris == 38
    assert s.materials.n_materials == 8  # + srgb + white1
    assert s.texture is not None and s.tex_res == (512, 512)
    # the light must now be D65-based: emission integrates > 0
    assert s.n_lights == 1


def test_plane_counts(tables):
    cfg = RenderConfig(scene="plane-srgb", mode="mallett")
    s = build_scene(cfg, tables)
    assert s.n_prims == 7 and s.n_tris == 14
    assert s.n_lights == 6


def test_rgb_mode_scene(tables_rgb):
    cfg = RenderConfig(scene="cornell", mode="rgb")
    s = build_scene(cfg, tables_rgb)
    m = s.materials
    assert np.allclose(np.asarray(m.emission_rgb)[5], [200, 200, 200])
    assert np.allclose(np.asarray(m.albedo_rgb)[3], [0.07, 0.38, 0.07])


def test_unknown_scene(tables):
    with pytest.raises(ValueError):
        build_scene(RenderConfig(scene="nope"), tables)


def test_camera_affine_matches_matrix_unprojection():
    """The affine factorization must reproduce the reference's full
    (PV)^-1-based unprojection (reference src/renderer.cpp:127-132) to f32
    accuracy across the whole NDC square."""
    pos = np.array([278.0, 273.0, -800.0])
    direction = np.array([0.0, 0.0, 1.0])
    up = np.array([0.0, 1.0, 0.0])
    cam = make_camera(pos, direction, up, (512, 512), 39.0, 0.1, 1.0)

    p = perspective_fov(np.radians(39.0), 512.0, 512.0, 0.1, 1.0)
    v = look_at(pos, pos + direction, up)
    pv_inv = np.linalg.inv(p @ v)

    n = 41
    xs = np.linspace(-1, 1, n)
    for x in xs:
        for y in (-1.0, -0.5, 0.0, 0.5, 1.0):
            pt = pv_inv @ np.array([x, y, 0.0, 1.0])
            pt = pt[:3] / pt[3]
            ref_dir = pt - pos
            ref_dir /= np.linalg.norm(ref_dir)
            got = (
                np.asarray(cam.axis_o)
                + x * np.asarray(cam.axis_x)
                + y * np.asarray(cam.axis_y)
            )
            got = got / np.linalg.norm(got)
            assert np.abs(got - ref_dir).max() < 1e-6, (x, y)


def test_camera_orientation(tables):
    cfg = RenderConfig(scene="cornell", mode="mallett")
    s = build_scene(cfg, tables)
    cam = s.camera
    # center ray looks straight down +z
    center = np.asarray(cam.axis_o)
    center = center / np.linalg.norm(center)
    assert np.allclose(center, [0, 0, 1], atol=1e-6)
    # +ndc_y is up (world +y), +ndc_x is world -x (right-handed lookAt)
    up_ray = np.asarray(cam.axis_o + cam.axis_y)
    assert up_ray[1] > 0.1
    right_ray = np.asarray(cam.axis_o + cam.axis_x)
    assert right_ray[0] < -0.1


def test_light_spectrum_scaling(tables):
    cfg = RenderConfig(scene="cornell", mode="mallett")
    s = build_scene(cfg, tables)
    # cornell light: light.csv x 200 on [400,700] (reference src/scene.cpp:92-95)
    m = s.materials
    ev = np.asarray(m.emission_values)[5]
    from simple_spectral_tpu.spectra.spectrum import load_spectral_csv

    raw = load_spectral_csv("scenes/cornell/light.csv")[0]
    assert np.allclose(ev[: raw.size], raw * 200.0, rtol=1e-6)
    assert float(m.emission_low[5]) == 400.0
