"""Scene as structure-of-arrays device data.

The reference scene is a pointer graph: Scene -> vector<PrimBase*> (virtual
dispatch) -> MaterialBase* (virtual dispatch) (reference src/scene.hpp:36-41,
src/geometry.hpp:26-104).  The TPU-native design flattens this into dense SoA
arrays + integer ids: triangles carry a material id and an owning-primitive id
(quads are two triangles, reference src/geometry.hpp:82-104); materials are a
table indexed by id with branchless selection inside the kernel.

Everything here is a registered pytree so the renderer can be differentiated
w.r.t. the material leaves (albedo/emission spectra, albedo RGB, texture).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Material BSDF types (reference MaterialLambertian / MaterialMirror,
# src/material.hpp:153-178).
BSDF_LAMBERTIAN = 0
BSDF_MIRROR = 1

# Albedo source (reference MaterialSimpleAlbedoBase::MODE, src/material.hpp:119).
ALBEDO_CONSTANT = 0
ALBEDO_TEXTURE = 1


def _pytree_dataclass(cls):
    """Register a dataclass as a pytree; fields named in ``_static`` are aux."""
    static = sorted(set(getattr(cls, "_static", ())))
    fields = [f.name for f in dataclasses.fields(cls)]
    dyn = [f for f in fields if f not in static]

    def flatten(obj):
        return (
            tuple(getattr(obj, f) for f in dyn),
            tuple(getattr(obj, f) for f in static),
        )

    def unflatten(aux, children):
        kw = dict(zip(dyn, children))
        kw.update(dict(zip(static, aux)))
        return cls(**kw)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@dataclasses.dataclass
class Camera:
    """Pinhole camera.

    Host init replicates glm::perspectiveFov + glm::lookAt + inverse in
    float64 (reference src/scene.cpp:16-24), then factors the unprojection
    into three world-space vectors so device ray generation is
    ``normalize(axis_o + ndc_x * axis_x + ndc_y * axis_y)`` -- affine in NDC,
    avoiding both the 4x4 matrix multiply and the reference's need for f64 on
    device (reference src/renderer.cpp:124-132).
    """

    _static = ("res",)

    pos: Any  # f32[3]
    axis_o: Any  # f32[3]
    axis_x: Any  # f32[3]
    axis_y: Any  # f32[3]
    forward: Any  # f32[3], for flat-field correction (renderer.cpp:262-266)
    res: Tuple[int, int] = (512, 512)


_pytree_dataclass(Camera)


@dataclasses.dataclass
class MaterialTable:
    """Dense material table; the differentiable leaves of the renderer."""

    _static = ("n_materials", "albedo_grid", "emission_grid")

    bsdf_type: Any  # i32[M]: BSDF_LAMBERTIAN | BSDF_MIRROR
    albedo_kind: Any  # i32[M]: ALBEDO_CONSTANT | ALBEDO_TEXTURE

    # Constant spectral albedo, per material on its own uniform grid
    # (padded to a common K; out-of-range samples are zero by construction).
    albedo_values: Any  # f32[M, Ka]
    albedo_low: Any  # f32[M]
    albedo_inv_step: Any  # f32[M]

    # Spectral emission.
    emission_values: Any  # f32[M, Ke]
    emission_low: Any  # f32[M]
    emission_inv_step: Any  # f32[M]

    # RGB-mode constants (reference compiles these instead; stdafx.hpp:180-186).
    albedo_rgb: Any  # f32[M, 3]
    emission_rgb: Any  # f32[M, 3]

    tex_id: Any  # i32[M]; -1 = no texture

    # Common-grid resample (scene/library.py common_grid): when every
    # material's uniform grid embeds exactly into one shared lattice
    # (g_low, g_step, Kc), `resample` holds the per-material hat matrix
    # R[m, j, k] mapping original samples -> shared-grid samples, so the
    # per-sample hero evaluation becomes res = values @ R^T followed by ONE
    # [M, Kc] x [Kc, S*N] MXU matmul instead of a per-material K-dense VPU
    # hat pass (render/shading.py precompute_constant_spectra).  None when
    # no exact shared lattice exists (fallback: per-material path).
    albedo_resample: Any = None  # f32[M, Kc_a, Ka] | None
    emission_resample: Any = None  # f32[M, Kc_e, Ke] | None
    albedo_grid: Any = None  # (g_low, g_step, Kc) floats/int, static
    emission_grid: Any = None  # (g_low, g_step, Kc), static

    n_materials: int = 0


_pytree_dataclass(MaterialTable)


@dataclasses.dataclass
class SceneData:
    _static = ("n_tris", "n_prims", "n_lights", "n_sphere_lights",
               "n_spheres", "n_bvh_entries", "name", "tex_res")

    # Geometry (SoA over triangles; quads = 2 triangles re-tagged to one prim,
    # reference src/geometry.cpp:128-139).
    tri_verts: Any  # f32[T, 3, 3]
    tri_st: Any  # f32[T, 3, 2]
    tri_normal: Any  # f32[T, 3]
    tri_prim: Any  # i32[T] owning primitive id (self-hit exclusion + NEE identity)
    tri_mat: Any  # i32[T]

    # Lights: per light primitive, its two triangle indices + its prim id
    # (uniform-over-lights NEE; reference src/scene.cpp:417-431).  Sphere
    # lights (north-star extension, round 5) ride the same list: kind=1
    # rows carry (center, radius) in light_sph and placeholder (0, 0)
    # triangle indices; NEE samples them with the reference's cone-cap
    # recipe (src/util/random.cpp:51-99 -> render/sampling.py
    # rand_toward_sphere).
    light_tris: Any  # i32[L, 2]
    light_prims: Any  # i32[L]

    materials: MaterialTable
    camera: Camera

    # Texture (at most one per scene in the reference), shipped as per-texel
    # data precomputed at scene build for the active color pipeline, so the
    # per-bounce texture albedo needs ONE gather.  Each mode's
    # position-independent table walk (Jakob-Hanika's 8-corner cube fetch,
    # Meng's grid-cell search; reference src/util/color.cpp:166-235, redone
    # per hit there) is hoisted to build time; only the paper's headline
    # on-the-fly step (per-hit *spectral* evaluation at the hero wavelengths)
    # stays on device.  Layout per mode (scanlines top-to-bottom, as lodepng
    # stores; widths are measured choices -- TPU gathers cost ~7 ns/index and
    # scale with row bytes, tools/bench_gather_micro.py):
    #   rgb, mallett: u32[Ht*Wt]     packed 0xRRGGBB sRGB (decode on device,
    #                                hidden behind the gather)
    #   jakob rows:   f32[Ht*Wt, 3]  sigmoid polynomial coefficients
    #   jakob u32:    u32[Ht*Wt]     coefficients asinh-companded to
    #                                10/11/11-bit fixed point (q32 format,
    #                                spectra/upsample_jakob.py; dequant
    #                                meta in texel_meta)
    #   meng rows:    f32[Ht*Wt, 12] 6 grid-point ids (exact ints) + 6 weights
    #   meng u32:     u32[Ht*Wt]     packed 0xRRGGBB sRGB; the grid walk
    #                                runs on device, gather-free
    #                                (spectra/upsample_meng.py onehot variant)
    texture: Any = None
    # q32 dequantization constants (jakob u32 texels): f32[9], else None.
    texel_meta: Any = None

    # Sphere-light rows of the light list (see the light block above).
    light_kind: Any = None  # i32[L]: 0 quad, 1 sphere (None = all quads)
    light_sph: Any = None  # f32[L, 4]: (cx, cy, cz, r); zeros for quads

    # Sphere primitives (north-star extension; the reference has spheres only
    # as dead bounding-sphere code, reference src/scene.cpp:420-425 inside an
    # `#if 0`-equivalent unused path).  None / 0 when the scene has none.
    # Emissive spheres join the light list (light_kind/light_sph above).
    sphere_center: Any = None  # f32[Sp, 3]
    sphere_radius: Any = None  # f32[Sp]
    sphere_prim: Any = None  # i32[Sp] owning primitive id (self-hit exclusion)
    sphere_mat: Any = None  # i32[Sp]

    # Flattened BVH (render/bvh.py): skip-link DFS entry array over all
    # primitives (tris + spheres), built host-side at scene build when the
    # primitive count outgrows the dense [T, N] sweep.  None for the small
    # built-in scenes.
    bvh_nodes: Any = None  # f32[Nn, 12] packed rows (see render/bvh.py)
    bvh_entry_ref: Any = None  # i32[Nn]: orig tri/sphere index (-1 internal)
    bvh_entry_mat: Any = None  # i32[Nn]: material id (0 for internal)

    # Block-cull cluster tiles (render/cull.py): SAH-partitioned primitive
    # clusters packed one DMA-able tile each; built alongside the BVH.
    cull_tiles: Any = None  # f32[C, 1+L, 12]
    cull_entry_ref: Any = None  # i32[C*(1+L)]
    cull_entry_mat: Any = None  # i32[C*(1+L)]

    n_tris: int = 0
    n_prims: int = 0
    n_lights: int = 0
    n_sphere_lights: int = 0  # static: picks the NEE program variant
    n_spheres: int = 0
    n_bvh_entries: int = 0
    name: str = ""
    tex_res: Tuple[int, int] = (0, 0)  # (W, H)


_pytree_dataclass(SceneData)


# --- host-side camera math (float64; init-time only) ---


def perspective_fov(fovy_rad: float, width: float, height: float, z_near: float, z_far: float) -> np.ndarray:
    """glm::perspectiveFov (RH, GL clip depth [-1,1]), row-major numpy."""
    h = np.cos(0.5 * fovy_rad) / np.sin(0.5 * fovy_rad)
    w = h * height / width
    m = np.zeros((4, 4), dtype=np.float64)
    m[0, 0] = w
    m[1, 1] = h
    m[2, 2] = -(z_far + z_near) / (z_far - z_near)
    m[3, 2] = -1.0
    m[2, 3] = -(2.0 * z_far * z_near) / (z_far - z_near)
    return m


def look_at(eye: np.ndarray, center: np.ndarray, up: np.ndarray) -> np.ndarray:
    """glm::lookAt (RH), row-major numpy."""
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float64)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)
    return m


def make_camera(
    pos, direction, up, res: Tuple[int, int], vfov_deg: float, near: float, far: float,
    dtype=jnp.float32,
) -> Camera:
    """Build the device camera from the reference's parameters.

    The reference unprojects NDC (x, y, 0, 1) through (P V)^-1 and normalizes
    in double precision (reference src/renderer.cpp:127-132).  For a pinhole
    P, the unprojected point is affine in (x, y) after the perspective divide
    (w depends only on the fixed NDC z), so we factor:
        point(x,y) = (c3 + x c0 + y c1) / w3,
        dir(x,y)  ~ axis_o + x axis_x + y axis_y
    with the factorization done on host in float64.
    """
    pos = np.asarray(pos, dtype=np.float64)
    direction = np.asarray(direction, dtype=np.float64)
    up = np.asarray(up, dtype=np.float64)
    p = perspective_fov(np.radians(vfov_deg), float(res[0]), float(res[1]), near, far)
    v = look_at(pos, pos + direction, up)
    pv_inv = np.linalg.inv(p @ v)
    c0, c1, c3 = pv_inv[:, 0], pv_inv[:, 1], pv_inv[:, 3]
    # w must not depend on x, y for the affine factorization to hold.
    assert abs(c0[3]) < 1e-12 and abs(c1[3]) < 1e-12, "non-pinhole projection"
    w3 = c3[3]
    axis_o = c3[:3] / w3 - pos
    axis_x = c0[:3] / w3
    axis_y = c1[:3] / w3
    # Pre-scale for f32 conditioning: |axis_o| ~ 1.
    scale = 1.0 / np.linalg.norm(axis_o)
    fwd = direction / np.linalg.norm(direction)
    return Camera(
        pos=jnp.asarray(pos, dtype),
        axis_o=jnp.asarray(axis_o * scale, dtype),
        axis_x=jnp.asarray(axis_x * scale, dtype),
        axis_y=jnp.asarray(axis_y * scale, dtype),
        forward=jnp.asarray(fwd, dtype),
        res=(int(res[0]), int(res[1])),
    )
