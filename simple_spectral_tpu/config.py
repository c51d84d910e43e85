"""Runtime render configuration.

Every compile-time ``#define`` of the reference (reference src/stdafx.hpp:39-124)
becomes a runtime field here.  The dataclass is frozen & hashable so it can be
passed as a static argument to ``jax.jit`` -- each distinct configuration
compiles its own specialized XLA program, which recovers the reference's
"compile-time specialization" in the XLA compilation model.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Render modes (reference src/stdafx.hpp:63-93).
MODE_RGB = "rgb"
MODE_MALLETT = "mallett"  # RENDER_MODE_SPECTRAL_OURS
MODE_MENG = "meng"  # RENDER_MODE_SPECTRAL_MENG
MODE_JAKOB = "jakob"  # RENDER_MODE_SPECTRAL_JH
SPECTRAL_MODES = (MODE_MALLETT, MODE_MENG, MODE_JAKOB)
ALL_MODES = (MODE_RGB,) + SPECTRAL_MODES

# Wavelength ranges per observer (reference src/stdafx.hpp:115-123).
_LAMBDA_RANGE = {1931: (380.0, 780.0), 2006: (390.0, 830.0)}


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static configuration of a render.

    Fields mirror the reference's two config tiers: compile-time #defines
    (reference src/stdafx.hpp:39-124) and the CLI-parsed ``Renderer::Options``
    (reference src/renderer.hpp:16-29).
    """

    # --- scene / image (Renderer::Options) ---
    scene: str = "cornell"  # cornell | cornell-srgb | plane-srgb | cornell-stress
    width: int = 512
    height: int = 512
    spp: int = 64
    indirect_only: bool = False

    # --- color pipeline (stdafx.hpp:63-93) ---
    mode: str = MODE_MALLETT
    observer: int = 1931  # CIE_OBSERVER: 1931 (2 deg) | 2006 (10 deg)
    n_wavelengths: int = 4  # SAMPLE_WAVELENGTHS, hero wavelength count

    # --- integrator (stdafx.hpp:44-58) ---
    els: bool = True  # EXPLICIT_LIGHT_SAMPLING
    max_depth: int = 10  # MAX_DEPTH (includes shadow rays)
    flat_field: bool = True  # FLAT_FIELD_CORRECTION
    eps: float = 1e-3  # EPS

    # --- TPU execution shape (new; no reference analog) ---
    # Max path-state lanes resident per integrator step; the renderer tiles
    # (pixels x spp) into chunks of at most this many lanes.
    max_lanes: int = 1 << 21
    # Closest-hit sweep implementation: "auto" resolves by measurement --
    # currently the XLA [T, N] formulation on every backend (826 vs 287
    # Mrays/s against the Pallas MXU kernel at cornell's 38 triangles; see
    # render/intersect.py resolve_intersect_impl).  "xla" / "pallas" force
    # one (render/intersect.py vs render/intersect_pallas.py).
    intersect_impl: str = "auto"
    # Unroll the geometry (depth) loop instead of lax.scan: scan-stacked
    # [D-1, N] outputs get a T(1,128) row layout whose per-bounce slices
    # cost ~13.7 ms of relayout copies each on v5e (round-4 xplane
    # profiles); unrolled, every record stays a packed 1-D [N] array.
    # Depth is static and small; scan remains selectable for huge depths.
    unroll_geometry: bool = True
    # Rematerialize the per-lane material-spectra cache in the backward sweep
    # (jax.checkpoint around precompute_constant_spectra): trades a cheap
    # recompute for not saving the [K, M, S, N] hat-weight residuals.
    remat_cache: bool = True
    # Debug mode: instrument the traced render with jax.experimental.checkify
    # float checks (NaN / inf / div-by-zero, each reported with its source
    # line).  The compute path is written where-before-divide so a clean
    # scene raises nothing; degenerate inputs fail at the originating op
    # instead of as a silently black/NaN image.  Costs compile + run time;
    # CPU-debugging aid, off by default.
    debug_checks: bool = False
    # --- BVH-scale scenes (new; the reference's largest scene is 38 tris
    # and it has no acceleration structure, reference src/scene.cpp:433-445).
    # A BVH is built at scene build when the primitive count reaches
    # bvh_threshold (then intersect_impl="auto" resolves to the traversal
    # arm, render/bvh.py); the cornell-stress scene adds stress_boxes random
    # rotated boxes (10 tris each) and stress_spheres spheres on top of the
    # cornell base, with stress_materials extra random Lambertian/mirror
    # materials.
    bvh_threshold: int = 512
    bvh_leaf_size: int = 4
    # block-cull cluster capacity (render/cull.py; <= 63 so the row index
    # fits the packed best key's 6 low mantissa bits)
    cull_cluster_size: int = 63
    stress_boxes: int = 1000
    stress_spheres: int = 500
    # emissive spheres added to the stress scene (NEE samples them with the
    # cone-cap sampler; reference src/util/random.cpp:51-99 recipe)
    stress_sphere_lights: int = 0
    stress_materials: int = 16
    stress_seed: int = 1234

    # Texel storage for the jakob/meng pipelines (rgb/mallett always ship
    # ONE packed-u32 sRGB word per texel).  On v5e the merged per-bounce
    # texel fetch is gather-engine bound at ~7-9 ns per index for 1-D u32
    # takes vs ~11-17 ns for multi-word rows (tools/pack_micro_r04.json,
    # tools/ctx_gather_r04.json), so the f32-row formats pay ~2x on the
    # dominant op of the textured configs:
    #   "u32":  one word per texel -- jakob: the three sigmoid-polynomial
    #           coefficients asinh-companded to 10/11/11-bit fixed point in
    #           a range-normalized wavelength basis (measured fidelity on
    #           the shipped texture: block-mean Y error <= 1.6e-4, ~25x
    #           inside the reference-parity tolerance; per-texel XYZ mean
    #           err 6.8e-4 -- tools/texel_q32_check.py); meng: the raw
    #           sRGB texel, with the full chromaticity-grid walk
    #           (reference src/meng-et-al.-2015/spectrum_grid.h:13-137)
    #           re-run on device as gather-free one-hot math over the 168
    #           grid cells (exact same arithmetic as the build-time walk).
    #   "rows": exact f32 rows (jakob [T,3] coeffs, meng [T,12] point
    #           ids + weights) -- the fidelity-reference layout.
    texel_format: str = "u32"

    # Texture used by cornell-srgb / plane-srgb.  The reference points at a
    # 4096^2 texture missing from its own checkout (reference
    # src/scene.cpp:292 and .MISSING_LARGE_BLOBS); the in-repo 512^2 texture
    # is the reference's own fallback (reference src/scene.cpp:291).
    texture: str = "crystal-lizard-512.png"

    def __post_init__(self):
        if self.mode not in ALL_MODES:
            raise ValueError(f"unknown mode {self.mode!r}; valid: {ALL_MODES}")
        if self.observer not in (1931, 2006):
            raise ValueError("observer must be 1931 or 2006")
        if self.n_wavelengths < 1:
            raise ValueError("n_wavelengths must be >= 1")
        if self.max_depth < 1:
            raise ValueError("max_depth must be >= 1")
        if self.intersect_impl not in ("auto", "xla", "xla2", "pallas", "bvh", "cull"):
            raise ValueError(
                "intersect_impl must be auto | xla | xla2 | pallas | bvh | cull"
            )
        if self.texel_format not in ("u32", "rows"):
            raise ValueError("texel_format must be u32 | rows")
        # The reference refuses non-"Ours" + CIE 2006 at compile time
        # (src/stdafx.hpp:107-109).  We *support* it (documented extension):
        # meng/jakob table coverage is clamped to their fitted range.

    # --- derived quantities ---

    @property
    def spectral(self) -> bool:
        return self.mode != MODE_RGB

    @property
    def lambda_min(self) -> float:
        return _LAMBDA_RANGE[self.observer][0]

    @property
    def lambda_max(self) -> float:
        return _LAMBDA_RANGE[self.observer][1]

    @property
    def lambda_step(self) -> float:
        """Width of the band each hero wavelength covers (stdafx.hpp:289)."""
        return (self.lambda_max - self.lambda_min) / float(self.n_wavelengths)

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.width, self.height)

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
