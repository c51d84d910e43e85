"""The three built-in scenes, as SoA device arrays.

Re-implements the hard-coded scene builders of the reference
(``Scene::get_new_cornell`` reference src/scene.cpp:32-287,
``get_new_cornell_srgb`` src/scene.cpp:288-319, ``get_new_plane_srgb``
src/scene.cpp:320-415) as data: a host-side build step producing a
:class:`SceneData` pytree of flat arrays.

Geometry convention matches the reference: a quad (v00, v10, v11, v01)
becomes two triangles (v00, v10, v11) and (v00, v11, v01), both tagged with
the owning quad's primitive id (reference src/geometry.hpp:82-104,
src/geometry.cpp:128-139).

Note the reference's camera uses the *scene's* hard-coded 512x512 resolution
for the projection aspect even when the framebuffer resolution differs
(``Scene::_init`` uses ``camera.res``, reference src/scene.cpp:16-24, while
rendering maps pixels via ``framebuffer.res``, src/renderer.cpp:113-117); we
replicate that.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.scene.types import (
    ALBEDO_CONSTANT,
    ALBEDO_TEXTURE,
    BSDF_LAMBERTIAN,
    BSDF_MIRROR,
    Camera,
    MaterialTable,
    SceneData,
    make_camera,
)
from simple_spectral_tpu.spectra.colorimetry import ColorTables
from simple_spectral_tpu.spectra.spectrum import Spectrum, load_spectral_csv, data_path

SCENE_NAMES = ("cornell", "cornell-srgb", "plane-srgb", "cornell-stress")


def _common_grid_resample(specs, k_pad: int, lambda_min: float, lambda_max: float):
    """Exact shared lattice for a set of uniform-grid spectra + the per-
    material resample matrices, or (None, None) when no exact lattice exists.

    Every material's hat-reconstructed spectrum (linear interp, zero outside;
    reference src/spectrum.cpp:39-60) is piecewise-linear with breakpoints on
    its own lattice low_i + Z*step_i.  If one lattice of pitch g contains
    every breakpoint (g divides all steps and all pairwise low offsets), then
    resampling each spectrum onto that lattice is EXACT over the observable
    window: the resampled values are the original function at the shared
    nodes, and the function is linear between consecutive shared nodes.  The
    device can then evaluate every material's spectrum at the hero
    wavelengths with ONE shared hat-weight tensor and an MXU matmul instead
    of a per-material K-dense VPU pass (render/shading.py).

    Returns ((g_low, g_step, kc), R f32[M, kc, k_pad]) with
    resampled = values @ R[m].T exactly reproducing each original spectrum.
    """
    from fractions import Fraction

    import math

    try:
        fr = [(Fraction(repr(float(s.low))), Fraction(repr(float(s.step))),
               s.values.size) for s in specs]
    except (ValueError, ArithmeticError):
        return None, None
    # lattice pitch: gcd of all steps and all low offsets (Fraction gcd)
    vals = [st for _, st, _ in fr] + [lo - fr[0][0] for lo, _, _ in fr[1:]]
    vals = [abs(v) for v in vals if v != 0]
    if not vals:
        return None, None
    den = math.lcm(*(v.denominator for v in vals))
    g = Fraction(math.gcd(*(int(v * den) for v in vals)), den)
    if g <= 0:
        return None, None
    # window [lambda_min - g, lambda_max + g], snapped down/up to the lattice
    lo0 = fr[0][0]
    g_low = lo0 + math.floor((Fraction(repr(float(lambda_min))) - g - lo0) / g) * g
    g_high = lo0 + math.ceil((Fraction(repr(float(lambda_max))) + g - lo0) / g) * g
    kc = int((g_high - g_low) / g) + 1
    if kc > 4096:  # pathological lattice: shared pass would cost more than it saves
        return None, None

    nodes = np.asarray([float(g_low + j * g) for j in range(kc)], np.float64)
    m = len(specs)
    r = np.zeros((m, kc, k_pad), np.float32)
    for i, s in enumerate(specs):
        x = (nodes - float(s.low)) / float(s.step)  # [kc]
        kk = np.arange(s.values.size, dtype=np.float64)
        r[i, :, : s.values.size] = np.maximum(0.0, 1.0 - np.abs(x[:, None] - kk[None, :]))
    return (float(g_low), float(g), kc), r


class _HostMaterial:
    """Host-side material description gathered before packing."""

    def __init__(
        self,
        bsdf: int = BSDF_LAMBERTIAN,
        albedo_spec: Optional[Spectrum] = None,
        albedo_rgb: Tuple[float, float, float] = (1.0, 1.0, 1.0),
        emission_spec: Optional[Spectrum] = None,
        emission_rgb: Tuple[float, float, float] = (0.0, 0.0, 0.0),
        tex_id: int = -1,
    ):
        self.bsdf = bsdf
        self.albedo_spec = albedo_spec
        self.albedo_rgb = albedo_rgb
        self.emission_spec = emission_spec
        self.emission_rgb = emission_rgb
        self.tex_id = tex_id

    def is_emissive(self, spectral: bool) -> bool:
        # reference src/material.cpp:100-106
        if spectral:
            return self.emission_spec is not None and self.emission_spec.integrate() > 0.0
        return any(c > 0.0 for c in self.emission_rgb)


class _Builder:
    def __init__(self, cfg: RenderConfig, tables: ColorTables):
        self.cfg = cfg
        self.tables = tables
        self.materials: List[_HostMaterial] = []
        self.mat_names: dict = {}
        self.quads: List[tuple] = []  # (mat_id, verts f64[4,3], sts f64[4,2])
        self.spheres: List[tuple] = []  # (mat_id, center f64[3], radius)
        self.texture: Optional[np.ndarray] = None

    def add_material(self, name: str, mat: _HostMaterial) -> int:
        mid = len(self.materials)
        self.materials.append(mat)
        self.mat_names[name] = mid
        return mid

    def add_quad(self, mat: int, v00, v10, v11, v01, st00=(0, 0), st10=(0, 0), st11=(0, 0), st01=(0, 0)):
        verts = np.asarray([v00, v10, v11, v01], dtype=np.float64)
        sts = np.asarray([st00, st10, st11, st01], dtype=np.float64)
        self.quads.append((mat, verts, sts))

    def add_sphere(self, mat: int, center, radius: float):
        """Sphere primitive (north-star extension; the reference has none --
        its SphereBound type backs only dead code, src/scene.cpp:420-425).
        Sphere materials must be non-emissive: NEE samples quad lights only."""
        self.spheres.append((mat, np.asarray(center, np.float64), float(radius)))

    def const_spectrum(self, value: float) -> Spectrum:
        """Constant spectrum over [LAMBDA_MIN, LAMBDA_MAX] (reference
        src/spectrum.cpp:11-13)."""
        return Spectrum.constant(value, self.cfg.lambda_min, self.cfg.lambda_max)

    def load_texture(self) -> int:
        """Load the scene texture (sRGB u8, scanlines top-to-bottom, as
        lodepng returns; reference src/material.cpp:10-29).  Returns tex id."""
        if self.texture is not None:
            return 0
        from PIL import Image

        path = data_path("scenes", self.cfg.texture)
        img = Image.open(path).convert("RGB")
        self.texture = np.asarray(img, dtype=np.uint8)  # [H, W, 3], top-to-bottom
        return 0

    def finish(self, name: str) -> SceneData:
        cfg = self.cfg
        spectral = cfg.spectral
        # --- pack materials ---
        m = len(self.materials)
        zero = self.const_spectrum(0.0)
        alb_specs = [
            (mat.albedo_spec if mat.albedo_spec is not None else self.const_spectrum(1.0))
            for mat in self.materials
        ]
        emi_specs = [
            (mat.emission_spec if mat.emission_spec is not None else zero)
            for mat in self.materials
        ]
        ka = max(s.values.size for s in alb_specs)
        ke = max(s.values.size for s in emi_specs)

        def pack(specs, k):
            # Zero padding beyond each spectrum's true sample count reproduces
            # the reference's zero-outside-range semantics exactly (reference
            # src/spectrum.cpp:39-60): any gather index at or past the true
            # count lands on a zero, same as the reference's bounds check.
            vals = np.zeros((m, k), dtype=np.float32)
            low = np.zeros(m, dtype=np.float32)
            inv_step = np.ones(m, dtype=np.float32)
            for i, s in enumerate(specs):
                vals[i, : s.values.size] = s.values
                low[i] = s.low
                inv_step[i] = 1.0 / s.step
            return vals, low, inv_step

        alb_vals, alb_low, alb_inv = pack(alb_specs, ka)
        emi_vals, emi_low, emi_inv = pack(emi_specs, ke)
        alb_grid, alb_res = _common_grid_resample(
            alb_specs, ka, cfg.lambda_min, cfg.lambda_max)
        emi_grid, emi_res = _common_grid_resample(
            emi_specs, ke, cfg.lambda_min, cfg.lambda_max)

        materials = MaterialTable(
            bsdf_type=jnp.asarray([mat.bsdf for mat in self.materials], jnp.int32),
            albedo_kind=jnp.asarray(
                [ALBEDO_TEXTURE if mat.tex_id >= 0 else ALBEDO_CONSTANT for mat in self.materials],
                jnp.int32,
            ),
            albedo_values=jnp.asarray(alb_vals),
            albedo_low=jnp.asarray(alb_low),
            albedo_inv_step=jnp.asarray(alb_inv),
            emission_values=jnp.asarray(emi_vals),
            emission_low=jnp.asarray(emi_low),
            emission_inv_step=jnp.asarray(emi_inv),
            albedo_rgb=jnp.asarray([mat.albedo_rgb for mat in self.materials], jnp.float32),
            emission_rgb=jnp.asarray([mat.emission_rgb for mat in self.materials], jnp.float32),
            tex_id=jnp.asarray([mat.tex_id for mat in self.materials], jnp.int32),
            albedo_resample=None if alb_res is None else jnp.asarray(alb_res),
            emission_resample=None if emi_res is None else jnp.asarray(emi_res),
            albedo_grid=alb_grid,
            emission_grid=emi_grid,
            n_materials=m,
        )

        # --- pack geometry: quad -> 2 triangles, same prim id ---
        tri_verts, tri_st, tri_mat, tri_prim = [], [], [], []
        emissive = [mat.is_emissive(spectral) for mat in self.materials]
        light_tris, light_prims = [], []
        for prim_id, (mat_id, v, st) in enumerate(self.quads):
            t0 = len(tri_verts)
            # tri0 = (v00, v10, v11); tri1 = (v00, v11, v01)
            tri_verts.append(v[[0, 1, 2]])
            tri_st.append(st[[0, 1, 2]])
            tri_verts.append(v[[0, 2, 3]])
            tri_st.append(st[[0, 2, 3]])
            tri_mat += [mat_id, mat_id]
            tri_prim += [prim_id, prim_id]
            if emissive[mat_id]:
                light_tris.append((t0, t0 + 1))
                light_prims.append(prim_id)
        tv = np.asarray(tri_verts, dtype=np.float64)  # [T, 3, 3]
        # flat normal = normalize(cross(v1-v0, v2-v0)) (reference src/geometry.hpp:68)
        n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
        n = n / np.linalg.norm(n, axis=-1, keepdims=True)

        assert light_prims, "scene must have at least one light (reference src/scene.cpp:30)"

        # --- spheres (primitive ids continue after the quads) ---
        n_spheres = len(self.spheres)
        sphere_kw = {}
        sp_center = sp_radius = sp_prim = sp_mat = None
        # sphere lights: emissive spheres join the NEE light list with the
        # cone-cap sampler (reference src/util/random.cpp:51-99 recipe;
        # render/sampling.py rand_toward_sphere).  kind/params arrays are
        # assembled below alongside the quad lights.
        light_kind = [0] * len(light_prims)
        light_sph = [(0.0, 0.0, 0.0, 0.0)] * len(light_prims)
        if n_spheres:
            for si, (mat_id, c, r) in enumerate(self.spheres):
                if emissive[mat_id]:
                    light_prims.append(len(self.quads) + si)
                    light_tris.append((0, 0))  # placeholder, masked by kind
                    light_kind.append(1)
                    light_sph.append((float(c[0]), float(c[1]), float(c[2]),
                                      float(r)))
            sp_center = np.asarray([c for _, c, _ in self.spheres], np.float64)
            sp_radius = np.asarray([r for _, _, r in self.spheres], np.float64)
            sp_mat = np.asarray([m for m, _, _ in self.spheres], np.int32)
            sp_prim = np.arange(
                len(self.quads), len(self.quads) + n_spheres, dtype=np.int32
            )
            sphere_kw = dict(
                sphere_center=jnp.asarray(sp_center, jnp.float32),
                sphere_radius=jnp.asarray(sp_radius, jnp.float32),
                sphere_prim=jnp.asarray(sp_prim),
                sphere_mat=jnp.asarray(sp_mat),
            )

        # --- BVH: built once the primitive count outgrows the dense sweep
        # (or when explicitly forced via cfg.intersect_impl="bvh") ---
        bvh_kw = {}
        n_bvh_entries = 0
        want_bvh = (
            cfg.intersect_impl in ("bvh", "cull")
            or len(tri_mat) + n_spheres >= cfg.bvh_threshold
        )
        if want_bvh:
            from simple_spectral_tpu.render.bvh import build_bvh_arrays
            from simple_spectral_tpu.render.cull import build_cluster_arrays

            nodes, entry_ref, entry_mat = build_bvh_arrays(
                tv, np.asarray(tri_prim, np.int32), np.asarray(tri_mat, np.int32),
                sp_center, sp_radius, sp_prim, sp_mat,
                leaf_size=cfg.bvh_leaf_size,
            )
            n_bvh_entries = nodes.shape[0]
            tiles, c_ref, c_mat = build_cluster_arrays(
                tv, np.asarray(tri_prim, np.int32), np.asarray(tri_mat, np.int32),
                sp_center, sp_radius, sp_prim, sp_mat,
                cluster_size=cfg.cull_cluster_size,
            )
            bvh_kw = dict(
                bvh_nodes=jnp.asarray(nodes),
                bvh_entry_ref=jnp.asarray(entry_ref),
                bvh_entry_mat=jnp.asarray(entry_mat),
                cull_tiles=jnp.asarray(tiles),
                cull_entry_ref=jnp.asarray(c_ref),
                cull_entry_mat=jnp.asarray(c_mat),
            )

        camera = self._camera()
        tex_rows = None
        tex_meta = None
        if self.texture is not None:
            srgb_words = (
                (self.texture[..., 0].astype(np.uint32) << 16)
                | (self.texture[..., 1].astype(np.uint32) << 8)
                | self.texture[..., 2].astype(np.uint32)
            ).reshape(-1)
            if spectral and cfg.mode == "jakob" and cfg.texel_format == "rows":
                tex_rows = self._texel_jakob_rows()
            elif spectral and cfg.mode == "jakob":
                # q32: the three sigmoid coefficients companded into ONE u32
                # per texel (spectra/upsample_jakob.py jakob_q32_pack) so the
                # merged per-bounce fetch is a 1-D u32 gather like mallett's.
                tex_rows, tex_meta = self._texel_jakob_q32()
            elif spectral and cfg.mode == "meng" and cfg.texel_format == "rows":
                tex_rows = self._texel_meng_rows()
            else:
                # rgb/mallett -- and meng with texel_format="u32", whose
                # grid walk runs on device from the raw texel
                # (render/shading.py): ONE packed u32 per texel; the exact
                # sRGB u8 -> lRGB decode stays on device, where it is hidden
                # behind the gather (measured: tools/bench_gather_micro.py --
                # a f32[T,3] row gather is ~1.5x slower than u32[T] + pow
                # decode)
                tex_rows = jnp.asarray(srgb_words)
        return SceneData(
            tri_verts=jnp.asarray(tv, jnp.float32),
            tri_st=jnp.asarray(np.asarray(tri_st), jnp.float32),
            tri_normal=jnp.asarray(n, jnp.float32),
            tri_prim=jnp.asarray(tri_prim, jnp.int32),
            tri_mat=jnp.asarray(tri_mat, jnp.int32),
            light_tris=jnp.asarray(light_tris, jnp.int32),
            light_prims=jnp.asarray(light_prims, jnp.int32),
            light_kind=jnp.asarray(light_kind, jnp.int32),
            light_sph=jnp.asarray(light_sph, jnp.float32),
            materials=materials,
            camera=camera,
            texture=tex_rows,
            texel_meta=tex_meta,
            **sphere_kw,
            **bvh_kw,
            n_tris=len(tri_mat),
            n_prims=len(self.quads) + n_spheres,
            n_lights=len(light_prims),
            n_sphere_lights=sum(light_kind),
            n_spheres=n_spheres,
            n_bvh_entries=n_bvh_entries,
            name=name,
            tex_res=(
                (int(self.texture.shape[1]), int(self.texture.shape[0]))
                if self.texture is not None
                else (0, 0)
            ),
        )

    def _camera(self) -> Camera:
        raise NotImplementedError

    def _texel_lrgb(self):
        """Texture as linear-RGB channel arrays (f32[T] x3), for the
        build-time per-texel upsample precomputations."""
        from simple_spectral_tpu.spectra.colorimetry import srgb_to_lrgb_np

        lrgb = srgb_to_lrgb_np(
            np.asarray(self.texture, np.float32).reshape(-1, 3) / 255.0
        )
        return (
            jnp.asarray(lrgb[:, 0]),
            jnp.asarray(lrgb[:, 1]),
            jnp.asarray(lrgb[:, 2]),
        )

    def _texel_jakob_rows(self):
        """Per-texel sigmoid-coefficient rows f32[T, 3] (texel_format="rows").

        The reference upsamples each texel on the fly per intersection
        (reference src/material.cpp:45-64); the position-dependent part of
        the Jakob-Hanika cube fetch depends only on the texel's RGB, so it is
        hoisted to scene build -- the per-bounce device work then needs no
        table gathers beyond one texel row."""
        from simple_spectral_tpu.spectra.upsample_jakob import rgb2spec_fetch_soa

        r, g, b = self._texel_lrgb()
        c0, c1, c2 = rgb2spec_fetch_soa(self.tables.jakob, r, g, b)
        return jnp.stack([c0, c1, c2], axis=-1)  # f32[T, 3]

    def _texel_jakob_q32(self):
        """Per-texel q32-packed coefficients (texel_format="u32"): the same
        cube fetch as _texel_jakob_rows, then asinh-companded 10/11/11-bit
        packing into one u32 per texel (spectra/upsample_jakob.py).
        Returns (words u32[T], meta f32[9])."""
        from simple_spectral_tpu.spectra.upsample_jakob import (
            jakob_q32_pack,
            rgb2spec_fetch_soa,
        )

        r, g, b = self._texel_lrgb()
        c0, c1, c2 = rgb2spec_fetch_soa(self.tables.jakob, r, g, b)
        words, meta = jakob_q32_pack(
            np.asarray(c0), np.asarray(c1), np.asarray(c2)
        )
        return jnp.asarray(words), jnp.asarray(meta)

    def _texel_meng_rows(self):
        """Per-texel Meng grid rows f32[T, 12] (texel_format="rows"): 6
        point ids (exact small ints in f32) + 6 weights, precomputed by the
        build-time grid walk (reference src/meng-et-al.-2015/
        spectrum_grid.h:13-137 redone per hit there)."""
        from simple_spectral_tpu.spectra.upsample_meng import (
            lrgb_to_xyz_meng,
            meng_cell_weights_soa,
        )

        r, g, b = self._texel_lrgb()
        x, y, z = lrgb_to_xyz_meng(r, g, b)
        pidx, w = meng_cell_weights_soa(self.tables.meng, x, y, z)
        return jnp.concatenate(
            [pidx.T.astype(jnp.float32), w.T], axis=-1
        )  # f32[T, 12]


def _cornell_builder(cfg: RenderConfig, tables: ColorTables) -> _Builder:
    b = _Builder(cfg, tables)
    spectral = cfg.spectral

    # Camera (reference src/scene.cpp:36-46); projection aspect uses the
    # scene's hard-coded 512x512, not the framebuffer resolution.
    def cam():
        return make_camera(
            pos=(278.0, 273.0, -800.0),
            direction=(0.0, 0.0, 1.0),
            up=(0.0, 1.0, 0.0),
            res=(512, 512),
            vfov_deg=39.0,
            near=0.1,
            far=1.0,
        )

    b._camera = cam

    # Materials (reference src/scene.cpp:48-105).
    if spectral:
        wgr = load_spectral_csv("scenes/cornell/white-green-red.csv")
        white = Spectrum(wgr[0], 400.0, 700.0)
        green = Spectrum(wgr[1], 400.0, 700.0)
        red = Spectrum(wgr[2], 400.0, 700.0)
        light_cols = load_spectral_csv("scenes/cornell/light.csv")
        light_emission = Spectrum(light_cols[0], 400.0, 700.0) * 200.0
        b.add_material("white-back", _HostMaterial(albedo_spec=white))
        b.add_material("white-blocks", _HostMaterial(albedo_spec=white))
        b.add_material("white-floorceil", _HostMaterial(albedo_spec=white))
        b.add_material("green", _HostMaterial(albedo_spec=green))
        b.add_material("red", _HostMaterial(albedo_spec=red))
        b.add_material(
            "light",
            _HostMaterial(albedo_spec=b.const_spectrum(0.78), emission_spec=light_emission),
        )
    else:
        # RGB-mode constants (reference src/scene.cpp:68-82,99-103).
        b.add_material("white-back", _HostMaterial(albedo_rgb=(1, 1, 1)))
        b.add_material("white-blocks", _HostMaterial(albedo_rgb=(1, 1, 1)))
        b.add_material("white-floorceil", _HostMaterial(albedo_rgb=(1, 1, 1)))
        b.add_material("green", _HostMaterial(albedo_rgb=(0.07, 0.38, 0.07)))
        b.add_material("red", _HostMaterial(albedo_rgb=(1, 0, 0)))
        b.add_material(
            "light",
            _HostMaterial(albedo_rgb=(0.78, 0.78, 0.78), emission_rgb=(200.0, 200.0, 200.0)),
        )

    N = b.mat_names
    # Floor (reference src/scene.cpp:108-114)
    b.add_quad(
        N["white-floorceil"],
        (552.8, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 559.2), (549.6, 0.0, 559.2),
        (1, 0), (0, 0), (0, 1), (1, 1),
    )
    # Ceiling with a hole for the light (reference src/scene.cpp:134-193).
    A = (0.0, 548.8, 559.2)
    B = (556.0, 548.8, 559.2)
    C = (0.0, 548.8, 0.0)
    D = (556.0, 548.8, 0.0)
    E = (213.0, 548.8, 332.0)
    F = (343.0, 548.8, 332.0)
    G = (213.0, 548.8, 227.0)
    H = (343.0, 548.8, 227.0)
    b.add_quad(N["light"], H, F, E, G, (1, 0), (1, 1), (0, 1), (0, 0))
    b.add_quad(N["white-floorceil"], D, B, F, H)
    b.add_quad(N["white-floorceil"], B, A, E, F)
    b.add_quad(N["white-floorceil"], A, C, G, E)
    b.add_quad(N["white-floorceil"], C, D, H, G)
    # Back wall (reference src/scene.cpp:196-201)
    b.add_quad(
        N["white-back"],
        (549.6, 0.0, 559.2), (0.0, 0.0, 559.2), (0.0, 548.8, 559.2), (556.0, 548.8, 559.2),
        (0, 0), (1, 0), (1, 1), (0, 1),
    )
    # Right wall, green (reference src/scene.cpp:204-209)
    b.add_quad(
        N["green"],
        (0.0, 0.0, 559.2), (0.0, 0.0, 0.0), (0.0, 548.8, 0.0), (0.0, 548.8, 559.2),
        (1, 0), (0, 0), (0, 1), (1, 1),
    )
    # Left wall, red (reference src/scene.cpp:212-217)
    b.add_quad(
        N["red"],
        (552.8, 0.0, 0.0), (549.6, 0.0, 559.2), (556.0, 548.8, 559.2), (556.0, 548.8, 0.0),
        (0, 0), (1, 0), (1, 1), (0, 1),
    )
    # Short block (reference src/scene.cpp:220-249)
    W = N["white-blocks"]
    b.add_quad(W, (130, 165, 65), (82, 165, 225), (240, 165, 272), (290, 165, 114))
    b.add_quad(W, (290, 0, 114), (290, 165, 114), (240, 165, 272), (240, 0, 272))
    b.add_quad(W, (130, 0, 65), (130, 165, 65), (290, 165, 114), (290, 0, 114))
    b.add_quad(W, (82, 0, 225), (82, 165, 225), (130, 165, 65), (130, 0, 65))
    b.add_quad(W, (240, 0, 272), (240, 165, 272), (82, 165, 225), (82, 0, 225))
    # Tall block (reference src/scene.cpp:252-281)
    b.add_quad(W, (423, 330, 247), (265, 330, 296), (314, 330, 456), (472, 330, 406))
    b.add_quad(W, (423, 0, 247), (423, 330, 247), (472, 330, 406), (472, 0, 406))
    b.add_quad(W, (472, 0, 406), (472, 330, 406), (314, 330, 456), (314, 0, 456))
    b.add_quad(W, (314, 0, 456), (314, 330, 456), (265, 330, 296), (265, 0, 296))
    b.add_quad(W, (265, 0, 296), (265, 330, 296), (423, 330, 247), (423, 0, 247))
    return b


def _cornell(cfg: RenderConfig, tables: ColorTables) -> SceneData:
    return _cornell_builder(cfg, tables).finish("cornell")


def _cornell_srgb(cfg: RenderConfig, tables: ColorTables) -> SceneData:
    """Cornell variant: blocks/floor/ceiling -> plain white, red wall -> sRGB
    texture, light -> D65 x 30 (reference src/scene.cpp:288-319)."""
    b = _cornell_builder(cfg, tables)
    spectral = cfg.spectral
    tex = b.load_texture()
    srgb_id = b.add_material("srgb", _HostMaterial(tex_id=tex))
    if spectral:
        white1_id = b.add_material("white1", _HostMaterial(albedo_spec=b.const_spectrum(1.0)))
    else:
        white1_id = b.add_material("white1", _HostMaterial(albedo_rgb=(1, 1, 1)))

    remap = {
        b.mat_names["white-blocks"]: white1_id,
        b.mat_names["white-floorceil"]: white1_id,
        b.mat_names["red"]: srgb_id,
    }
    b.quads = [(remap.get(mid, mid), v, st) for (mid, v, st) in b.quads]

    lightsc = 30.0
    light = b.materials[b.mat_names["light"]]
    if spectral:
        light.emission_spec = tables.host["d65_rad"] * lightsc
    else:
        light.emission_rgb = (lightsc, lightsc, lightsc)
    return b.finish("cornell-srgb")


def _plane_srgb(cfg: RenderConfig, tables: ColorTables) -> SceneData:
    """Textured unit quad facing the camera inside a white D65 box
    (reference src/scene.cpp:320-415, the paper's Fig. 1)."""
    b = _Builder(cfg, tables)
    spectral = cfg.spectral

    cam_pos = np.array([0.0, 0.0, 5.0])
    vfov = np.degrees(2.0 * np.arctan2(1.0, cam_pos[2]))

    def cam():
        return make_camera(
            pos=cam_pos,
            direction=-cam_pos / np.linalg.norm(cam_pos),
            up=(0.0, 1.0, 0.0),
            res=(512, 512),
            vfov_deg=float(vfov),
            near=0.1,
            far=1.0,
        )

    b._camera = cam

    if spectral:
        light_id = b.add_material(
            "light",
            _HostMaterial(
                albedo_spec=b.const_spectrum(0.0), emission_spec=tables.host["d65_rad"] * 1.0
            ),
        )
    else:
        light_id = b.add_material(
            "light", _HostMaterial(albedo_rgb=(0, 0, 0), emission_rgb=(1, 1, 1))
        )
    tex = b.load_texture()
    # With ELS the textured quad is Lambertian; without, a Mirror converges to
    # the same image much faster (reference src/scene.cpp:346-362).
    tex_bsdf = BSDF_LAMBERTIAN if cfg.els else BSDF_MIRROR
    tex_id = b.add_material("tex", _HostMaterial(bsdf=tex_bsdf, tex_id=tex))

    b.add_quad(
        tex_id,
        (-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0),
        (0, 0), (1, 0), (1, 1), (0, 1),
    )
    s = 10.0
    b.add_quad(light_id, (-s, -s, s), (-s, -s, -s), (-s, s, -s), (-s, s, s))
    b.add_quad(light_id, (s, -s, -s), (s, -s, s), (s, s, s), (s, s, -s))
    b.add_quad(light_id, (-s, -s, s), (s, -s, s), (s, -s, -s), (-s, -s, -s))
    b.add_quad(light_id, (s, s, s), (-s, s, s), (-s, s, -s), (s, s, -s))
    b.add_quad(light_id, (-s, -s, -s), (s, -s, -s), (s, s, -s), (-s, s, -s))
    b.add_quad(light_id, (s, -s, s), (-s, -s, s), (-s, s, s), (s, s, s))
    return b.finish("plane-srgb")


def _cornell_stress(cfg: RenderConfig, tables: ColorTables) -> SceneData:
    """Procedural BVH-scale stress scene (no reference analog: the largest
    reference scene is 38 triangles, src/scene.cpp:107-282, and its linear
    intersect loop never needed more).  The cornell base (walls + light +
    the two blocks) plus cfg.stress_boxes random rotated boxes (5 quads =
    10 tris each) and cfg.stress_spheres spheres, using cfg.stress_materials
    extra random materials (7/8 Lambertian with random piecewise-constant
    spectra, 1/8 mirrors).  Deterministic in cfg.stress_seed.

    Defaults give ~10.5k primitives; stress_boxes=10000 reaches ~100k tris.
    The brute-force dense sweep runs unchanged on this scene and is the
    oracle for tests/test_bvh.py (and remains the measured-fastest arm at
    this scale -- see render/intersect.py resolve_intersect_impl).
    """
    b = _cornell_builder(cfg, tables)
    spectral = cfg.spectral
    rng = np.random.default_rng(cfg.stress_seed)

    mat_ids = []
    for i in range(cfg.stress_materials):
        mirror = (i % 8) == 7
        if spectral:
            # random piecewise-constant reflectance on the cornell 400-700
            # grid (75 samples, reference data/scenes/cornell csv layout)
            vals = np.repeat(rng.uniform(0.15, 0.85, size=15), 5).astype(np.float64)
            mat = _HostMaterial(
                bsdf=BSDF_MIRROR if mirror else BSDF_LAMBERTIAN,
                albedo_spec=Spectrum(jnp.asarray(vals, jnp.float32), 400.0, 700.0),
            )
        else:
            mat = _HostMaterial(
                bsdf=BSDF_MIRROR if mirror else BSDF_LAMBERTIAN,
                albedo_rgb=tuple(rng.uniform(0.15, 0.85, size=3)),
            )
        mat_ids.append(b.add_material(f"stress{i}", mat))

    def rand_mat():
        return mat_ids[int(rng.integers(len(mat_ids)))]

    # boxes: random footprint position inside the cornell floor area, random
    # half-extents and yaw; 5 quads (4 sides + top), like the blocks
    for _ in range(cfg.stress_boxes):
        hx, hz = rng.uniform(4.0, 18.0, size=2)
        hy = rng.uniform(4.0, 30.0)
        cx = rng.uniform(30.0, 520.0)
        cz = rng.uniform(30.0, 530.0)
        y0 = rng.uniform(0.0, 380.0)
        ang = rng.uniform(0.0, 2.0 * np.pi)
        ca, sa = np.cos(ang), np.sin(ang)
        corners = []
        for dx, dz in ((-hx, -hz), (hx, -hz), (hx, hz), (-hx, hz)):
            corners.append((cx + dx * ca - dz * sa, cz + dx * sa + dz * ca))
        (x0, z0), (x1, z1), (x2, z2), (x3, z3) = corners
        lo, hi = y0, y0 + 2.0 * hy
        m = rand_mat()
        b.add_quad(m, (x0, hi, z0), (x1, hi, z1), (x2, hi, z2), (x3, hi, z3))
        b.add_quad(m, (x0, lo, z0), (x0, hi, z0), (x1, hi, z1), (x1, lo, z1))
        b.add_quad(m, (x1, lo, z1), (x1, hi, z1), (x2, hi, z2), (x2, lo, z2))
        b.add_quad(m, (x2, lo, z2), (x2, hi, z2), (x3, hi, z3), (x3, lo, z3))
        b.add_quad(m, (x3, lo, z3), (x3, hi, z3), (x0, hi, z0), (x0, lo, z0))

    for _ in range(cfg.stress_spheres):
        r = rng.uniform(4.0, 16.0)
        c = (rng.uniform(30.0, 520.0), rng.uniform(r, 420.0), rng.uniform(30.0, 530.0))
        b.add_sphere(rand_mat(), c, r)

    # emissive spheres (cfg.stress_sphere_lights): NEE samples them via the
    # cone-cap sampler (reference src/util/random.cpp:51-99 recipe)
    if cfg.stress_sphere_lights:
        if spectral:
            slight = b.add_material(
                "sphere-light",
                _HostMaterial(albedo_spec=b.const_spectrum(0.0),
                              emission_spec=tables.host["d65_rad"] * 8.0),
            )
        else:
            slight = b.add_material(
                "sphere-light",
                _HostMaterial(albedo_rgb=(0, 0, 0), emission_rgb=(4, 4, 4)),
            )
        for _ in range(cfg.stress_sphere_lights):
            r = rng.uniform(10.0, 25.0)
            c = (rng.uniform(60.0, 500.0), rng.uniform(300.0, 480.0),
                 rng.uniform(60.0, 500.0))
            b.add_sphere(slight, c, r)

    return b.finish("cornell-stress")


def build_scene(cfg: RenderConfig, tables: ColorTables) -> SceneData:
    """Build the scene named by ``cfg.scene`` (reference src/renderer.cpp:16-38)."""
    if cfg.scene == "cornell":
        return _cornell(cfg, tables)
    if cfg.scene == "cornell-srgb":
        return _cornell_srgb(cfg, tables)
    if cfg.scene == "plane-srgb":
        return _plane_srgb(cfg, tables)
    if cfg.scene == "cornell-stress":
        return _cornell_stress(cfg, tables)
    raise ValueError(f"unrecognized scene {cfg.scene!r}; supported: {SCENE_NAMES}")
