"""Vector math over structure-of-arrays triples.

TPU layout rule (pallas guide "Tiling Constraints"): the minor-most axis maps
to the 128-wide vector lane dimension.  An ``f32[N, 3]`` array wastes 42x of
every register tile; a triple of ``f32[N]`` arrays wastes nothing.  All hot
math therefore runs on ``V3 = (x, y, z)`` tuples of same-shaped arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, o):
        return V3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o):
        return V3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, s):
        return V3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def v3_from_rows(a) -> V3:
    """f32[..., 3] -> V3 of f32[...]."""
    return V3(a[..., 0], a[..., 1], a[..., 2])


def v3_to_rows(v: V3):
    return jnp.stack([v.x, v.y, v.z], axis=-1)


def splat(a, like) -> V3:
    """f32[3] constant -> V3 broadcast against ``like`` (an array)."""
    return V3(
        jnp.broadcast_to(a[0], like.shape),
        jnp.broadcast_to(a[1], like.shape),
        jnp.broadcast_to(a[2], like.shape),
    )


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def normalize(a: V3) -> V3:
    r = jax.lax.rsqrt(dot(a, a))
    return V3(a.x * r, a.y * r, a.z * r)


def where(c, a: V3, b: V3) -> V3:
    return V3(jnp.where(c, a.x, b.x), jnp.where(c, a.y, b.y), jnp.where(c, a.z, b.z))


def select3(k, a, b, c):
    """Per-element component select: k in {0,1,2} -> a/b/c (arrays)."""
    return jnp.where(k == 0, a, jnp.where(k == 1, b, c))
