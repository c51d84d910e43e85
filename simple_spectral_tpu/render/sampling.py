"""Monte-Carlo samplers as pure, batch-vectorized functions (SoA layout).

Counter-based threefry keys replace the reference's per-thread PCG-32 streams
(reference src/util/random.{hpp,cpp}); bit-exact parity with the reference is
impossible by construction, so equivalence is statistical (SURVEY.md
section 4 "hard parts").  All samplers are grad-safe: every division that can
hit 0/0 on degenerate inputs is masked with ``where`` *before* the division
so no NaN enters either the primal or the cotangent computation.  Vectors
are V3 lane tuples (see render/vec.py for the layout rationale).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from simple_spectral_tpu.render.vec import V3, cross, dot, normalize

PI = 3.14159265358979323846
TWO_PI = 2.0 * PI
# Largest float32 strictly below pi (reference src/util/spherical-tri.cpp:10-16).
PI_UNDER = float(jnp.asarray(0x40490FDA, jnp.uint32).view(jnp.float32))


def uniform(key, shape=()):
    return jax.random.uniform(key, shape, dtype=jnp.float32)


# --- orthonormal basis (reference src/util/math-helpers.hpp:14-38) ---


def onb_from_y(basis_y: V3) -> Tuple[V3, V3]:
    """Branchless ONB from a unit vector treated as the +y axis (Duff et al.
    / Pixar); returns (basis_x, basis_z)."""
    sign = jnp.where(basis_y.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + basis_y.z)
    b = basis_y.x * basis_y.y * a
    basis_x = V3(1.0 + sign * basis_y.x * basis_y.x * a, sign * b, -sign * basis_y.x)
    basis_z = V3(b, sign + basis_y.y * basis_y.y * a, -basis_y.y)
    return basis_x, basis_z


def rotated_to(dir_local: V3, normal: V3) -> V3:
    """Rotate a y-up local direction into the frame whose +y is ``normal``
    (reference src/util/math-helpers.hpp:34-38)."""
    bx, bz = onb_from_y(normal)
    return V3(
        dir_local.x * bx.x + dir_local.y * normal.x + dir_local.z * bz.x,
        dir_local.x * bx.y + dir_local.y * normal.y + dir_local.z * bz.y,
        dir_local.x * bx.z + dir_local.y * normal.z + dir_local.z * bz.z,
    )


def reflect(vec: V3, normal: V3) -> V3:
    """reference src/util/math-helpers.hpp:40-42 (vec points *away* from the
    surface, i.e. w_o)."""
    s = 2.0 * dot(vec, normal)
    return V3(s * normal.x - vec.x, s * normal.y - vec.y, s * normal.z - vec.z)


# --- hemisphere sampling ---


def rand_coshemi(key, shape, eps: float) -> Tuple[V3, jnp.ndarray]:
    """Cosine-weighted hemisphere sample around +y, pdf = cos/pi.

    The reference rejection-samples until pdf > EPS (src/util/random.cpp:29-49,
    probability ~1e-6 per draw); a loop is hostile to SIMD lanes, so we clamp
    the cosine away from zero instead -- the induced bias is below the f32
    noise floor.  Returns (dir V3[...], pdf f32[...])."""
    ka, kb = jax.random.split(key)
    angle = uniform(ka, shape) * TWO_PI
    radius_sq = uniform(kb, shape)
    # clamp so y = sqrt(1-r^2) stays > EPS (the reference's rejection bound)
    radius_sq = jnp.minimum(radius_sq, 1.0 - (eps * 1.01) ** 2)
    radius = jnp.sqrt(radius_sq)
    y = jnp.sqrt(1.0 - radius_sq)
    d = V3(radius * jnp.cos(angle), y, radius * jnp.sin(angle))
    return d, y * (1.0 / PI)


# --- cone cap toward a sphere (reference src/util/random.cpp:51-99) ---


def rand_toward_sphere(key, to_center: V3, radius) -> Tuple[V3, jnp.ndarray]:
    """Uniform direction over the spherical cap subtended by a sphere, plus
    the cap AREA (= reciprocal pdf; reference returns pdf = 1/area).

    Reference recipe (src/util/random.cpp:51-99): sample a 0.99999-shrunken
    sphere so the direction surely hits the real one; cos(theta) =
    sqrt(1 - (r/l)^2); cap area 2 pi (1 - cos theta); y uniform on
    [cos theta, 1], phi uniform, rotated so +y is the center direction.
    From INSIDE the sphere every direction hits: uniform full sphere
    (area 4 pi), matching the reference's rand_sphere fallback.

    Deviations for branchless f32 lanes: the reference computes the cap in
    double because 1 - sqrt(1 - x^2) cancels catastrophically for distant
    small spheres; we use the algebraically equal stable form
    1 - cos theta = x^2 / (1 + cos theta) and stay in f32.
    """
    ka, kb = jax.random.split(key)
    l2 = dot(to_center, to_center)
    l = jnp.sqrt(jnp.maximum(l2, 1e-24))
    inside = l < radius
    x = jnp.clip((radius * 0.99999) / l, 0.0, 1.0)
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    # stable 1 - cos(theta); inside: full sphere (cos theta := -1)
    one_minus = jnp.where(
        inside, 2.0, x * x / (1.0 + cos_theta)
    )
    area = TWO_PI * one_minus
    y = 1.0 - uniform(ka, l.shape) * one_minus  # in [cos theta, 1]
    phi = uniform(kb, l.shape) * TWO_PI
    rad = jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0))
    local = V3(rad * jnp.cos(phi), y, rad * jnp.sin(phi))
    inv_l = 1.0 / l
    axis = V3(to_center.x * inv_l, to_center.y * inv_l, to_center.z * inv_l)
    return rotated_to(local, axis), area


# --- spherical triangle (reference src/util/spherical-tri.{hpp,cpp}) ---


class SphericalTriangle(NamedTuple):
    A: V3  # unit vectors
    B: V3
    C: V3
    cos_c: jnp.ndarray  # cos of side c = dot(A,B)
    b: jnp.ndarray  # side b = angle(A,C)
    cos_alpha: jnp.ndarray  # vertex angle at A
    alpha: jnp.ndarray
    area: jnp.ndarray  # spherical excess (0 when degenerate)
    degenerate: jnp.ndarray  # bool[...]: numerically degenerate


def spherical_triangle(A: V3, B: V3, C: V3) -> SphericalTriangle:
    """Build the spherical triangle quantities the Arvo sampler needs.

    Follows reference src/util/spherical-tri.cpp:18-123 but collapses its
    branch ladder: any configuration where a vertex-angle denominator is not
    strictly positive is flagged ``degenerate`` with area = 0 (the reference
    sets NaN angles / zero area in those branches; both make the sample's
    pdf -> inf so the contribution is zero -- we keep the zero-area part and
    mask instead of propagating NaN)."""
    cos_a = jnp.clip(dot(B, C), -1.0, 1.0)
    cos_b = jnp.clip(dot(A, C), -1.0, 1.0)
    cos_c = jnp.clip(dot(A, B), -1.0, 1.0)
    a = jnp.clip(jnp.arccos(cos_a), 0.0, PI_UNDER)
    b = jnp.clip(jnp.arccos(cos_b), 0.0, PI_UNDER)
    c = jnp.clip(jnp.arccos(cos_c), 0.0, PI_UNDER)
    sin_a, sin_b, sin_c = jnp.sin(a), jnp.sin(b), jnp.sin(c)

    numer0 = cos_a - cos_b * cos_c
    numer1 = cos_b - cos_c * cos_a
    numer2 = cos_c - cos_a * cos_b
    denom0 = sin_b * sin_c
    denom1 = sin_c * sin_a
    denom2 = sin_a * sin_b

    ok = (denom0 > 0.0) & (denom1 > 0.0) & (denom2 > 0.0)
    safe = lambda n, d: jnp.clip(n / jnp.where(ok, d, 1.0), -1.0, 1.0)
    cos_alpha = safe(numer0, denom0)
    cos_beta = safe(numer1, denom1)
    cos_gamma = safe(numer2, denom2)
    alpha = jnp.clip(jnp.arccos(cos_alpha), 0.0, PI_UNDER)
    beta = jnp.clip(jnp.arccos(cos_beta), 0.0, PI_UNDER)
    gamma = jnp.clip(jnp.arccos(cos_gamma), 0.0, PI_UNDER)
    area = jnp.maximum(alpha + beta + gamma - PI, 0.0)
    area = jnp.where(ok, area, 0.0)

    return SphericalTriangle(
        A=A, B=B, C=C,
        cos_c=cos_c, b=b,
        cos_alpha=jnp.where(ok, cos_alpha, 1.0),
        alpha=jnp.where(ok, alpha, 0.0),
        area=area,
        degenerate=~ok,
    )


def _bar(x: V3, y: V3) -> V3:
    """normalize(x - dot(x,y) y), or 0 when the projection vanishes
    (reference src/util/random.cpp:137-142)."""
    s = dot(x, y)
    d = V3(x.x - s * y.x, x.y - s * y.y, x.z - s * y.z)
    lensq = dot(d, d)
    ok = lensq > 0.0
    r = jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, lensq, 1.0)), 0.0)
    return V3(d.x * r, d.y * r, d.z * r)


def rand_toward_spherical_triangle(key, tri: SphericalTriangle) -> V3:
    """Arvo 1995 stratified spherical-triangle sample (reference
    src/util/random.cpp:101-154).  Returns a unit direction V3[...]; the
    pdf is 1/tri.area (handled by the caller, reference
    src/geometry.cpp:103-116)."""
    k0, k1 = jax.random.split(key)
    r0 = uniform(k0, tri.area.shape)
    r1 = uniform(k1, tri.area.shape)

    sin_alpha = jnp.sin(tri.alpha)
    # main path (sin_alpha > 0)
    random_area = r0 * tri.area
    phi = random_area - tri.alpha
    s = jnp.sin(phi)
    t = jnp.cos(phi)
    u = t - tri.cos_alpha
    v = s + sin_alpha * tri.cos_c
    denom = (v * s + u * t) * sin_alpha
    denom_ok = denom != 0.0
    q_main = jnp.where(
        denom_ok,
        ((v * t - u * s) * tri.cos_alpha - v) / jnp.where(denom_ok, denom, 1.0),
        tri.cos_c,
    )
    # degenerate-alpha path: interpolate the angle linearly (random.cpp:131-136)
    q_degen = jnp.cos(tri.b * r0)
    q = jnp.where(sin_alpha > 0.0, q_main, q_degen)
    q = jnp.clip(q, -1.0, 1.0)

    bar_ca = _bar(tri.C, tri.A)
    sq = jnp.sqrt(jnp.maximum(1.0 - q * q, 0.0))
    c_hat = V3(
        q * tri.A.x + sq * bar_ca.x,
        q * tri.A.y + sq * bar_ca.y,
        q * tri.A.z + sq * bar_ca.z,
    )
    z = 1.0 - r1 * (1.0 - dot(c_hat, tri.B))
    z = jnp.clip(z, -1.0, 1.0)
    bar_cb = _bar(c_hat, tri.B)
    sz = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    return V3(
        z * tri.B.x + sz * bar_cb.x,
        z * tri.B.y + sz * bar_cb.y,
        z * tri.B.z + sz * bar_cb.z,
    )
