"""Spectra: host-side construction + device-side sampling.

Design: the reference's ``_Spectrum`` (reference src/spectrum.hpp:12-64,
src/spectrum.cpp) is an owning C++ class whose hot-path operation is the
hero-wavelength gather ``operator[](lambda_0)``.  On TPU we split this in two:

* :class:`Spectrum` -- a host-side (numpy, float64-capable) value type used at
  *init time only*: scene/table loading, spectrum arithmetic, and the exact
  product integrals the reference computes once in ``Color::init``.
* :class:`SpectrumTable` + :func:`sample_hero` -- the device representation: a
  uniform grid of values plus (low, inv_step) metadata, sampled with a
  vectorized linear-interp gather.  This is the only part that runs inside the
  jitted integrator, and it vectorizes over an arbitrary batch of wavelengths
  on the VPU.

Semantics match reference src/spectrum.cpp:29-67: linear reconstruction
between uniform samples, identically zero outside ``[low, high]``.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Union

import numpy as np
import jax.numpy as jnp

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def data_path(*parts: str) -> str:
    return os.path.join(DATA_DIR, *parts)


def load_spectral_csv(path: str) -> List[np.ndarray]:
    """Load a CSV of spectral data as a list of column vectors (float64).

    Equivalent of ``load_spectral_data`` (reference src/spectrum.cpp:177-213):
    rows of comma-separated floats -> list of columns.
    """
    if not os.path.isabs(path):
        path = data_path(path)
    rows = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rows.append([float(tok) for tok in line.replace(",", " ").split()])
    arr = np.asarray(rows, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    ncols = arr.shape[1]
    return [arr[:, i].copy() for i in range(ncols)]


class Spectrum:
    """Host-side uniform-grid spectrum over ``[low, high]`` nm.

    Mirrors ``_Spectrum`` (reference src/spectrum.hpp:12-64) but in float64
    numpy; used only at initialization time.
    """

    __slots__ = ("values", "low", "high", "step")

    def __init__(self, values: Union[float, Sequence[float], np.ndarray], low: float, high: float):
        if np.isscalar(values):
            values = np.array([float(values)] * 2, dtype=np.float64)
        self.values = np.asarray(values, dtype=np.float64)
        if self.values.size < 2:
            raise ValueError("spectrum needs at least two samples")
        self.low = float(low)
        self.high = float(high)
        self.step = (self.high - self.low) / float(self.values.size - 1)

    @staticmethod
    def constant(value: float, low: float, high: float) -> "Spectrum":
        return Spectrum(np.array([value, value]), low, high)

    # --- sampling (reference src/spectrum.cpp:29-60) ---

    def sample_nearest(self, lam) -> np.ndarray:
        lam = np.asarray(lam, dtype=np.float64)
        i = np.rint((lam - self.low) / self.step).astype(np.int64)
        ok = (i >= 0) & (i < self.values.size)
        return np.where(ok, self.values[np.clip(i, 0, self.values.size - 1)], 0.0)

    def sample_linear(self, lam) -> np.ndarray:
        lam = np.asarray(lam, dtype=np.float64)
        x = (lam - self.low) / self.step
        i0 = np.floor(x)
        frac = x - i0
        i0 = i0.astype(np.int64)
        i1 = i0 + 1
        n = self.values.size
        v0 = np.where((i0 >= 0) & (i0 < n), self.values[np.clip(i0, 0, n - 1)], 0.0)
        v1 = np.where((i1 >= 0) & (i1 < n), self.values[np.clip(i1, 0, n - 1)], 0.0)
        return v0 * (1.0 - frac) + v1 * frac

    # --- arithmetic (init-time only; reference src/spectrum.cpp:69-117) ---

    def __mul__(self, other):
        if np.isscalar(other):
            s = Spectrum(self.values * float(other), self.low, self.high)
            return s
        # Spectrum x Spectrum: resample both (nearest) onto the overlapping
        # uniform grid, exactly as reference src/spectrum.cpp:74-95.
        low = max(self.low, other.low)
        high = min(self.high, other.high)
        n = int(round((high - low) / self.step)) + 1
        lams = low + self.step * np.arange(n)
        return Spectrum(self.sample_nearest(lams) * other.sample_nearest(lams), low, high)

    __rmul__ = __mul__

    def __add__(self, other: "Spectrum") -> "Spectrum":
        low = max(self.low, other.low)
        high = min(self.high, other.high)
        n = int(round((high - low) / self.step)) + 1
        lams = low + self.step * np.arange(n)
        return Spectrum(self.sample_nearest(lams) + other.sample_nearest(lams), low, high)

    # --- integrals (reference src/spectrum.cpp:119-173) ---

    def integrate(self) -> float:
        """Midpoint-rule integral (reference src/spectrum.cpp:119-133)."""
        return float(self.values.sum() * self.step)

    @staticmethod
    def integrate_product(a: "Spectrum", b: "Spectrum") -> float:
        """Trapezoid rule on the merged sample points of both spectra.

        Replicates reference src/spectrum.cpp:134-173 exactly, including the
        one-sample-outward extension where both spectra are guaranteed zero.
        """
        low = max(a.low - a.step, b.low - b.step)
        high = min(a.high + a.step, b.high + b.step)
        pts = set()
        for s in (a, b):
            lam = s.low - s.step
            # advance to first sample >= low
            if lam < low:
                k = int(np.ceil((low - lam) / s.step - 1e-9))
                lam = lam + k * s.step
            while lam <= high + 1e-9:
                pts.add(round(lam, 6))
                lam += s.step
        pts = np.asarray(sorted(pts), dtype=np.float64)
        if pts.size < 2:
            return 0.0
        va = a.sample_linear(pts)
        vb = b.sample_linear(pts)
        prod = va * vb
        return float(np.sum(0.5 * (prod[:-1] + prod[1:]) * np.diff(pts)))

    def to_table(self, dtype=jnp.float32) -> "SpectrumTable":
        return SpectrumTable(
            values=jnp.asarray(self.values, dtype=dtype),
            low=float(self.low),
            inv_step=float(1.0 / self.step),
        )


class SpectrumTable:
    """Device representation of a uniform-grid spectrum: a pytree of
    (values[K], low, inv_step), sampled by :func:`sample_linear` et al."""

    __slots__ = ("values", "low", "inv_step")

    def __init__(self, values, low: float, inv_step: float):
        self.values = values
        self.low = low
        self.inv_step = inv_step

    def tree_flatten(self):
        return (self.values,), (self.low, self.inv_step)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0], aux[1])


import jax.tree_util as _tree_util  # noqa: E402

_tree_util.register_pytree_node(
    SpectrumTable, SpectrumTable.tree_flatten, SpectrumTable.tree_unflatten
)


# --- device-side sampling primitives (the hot path) ---


def sample_linear(values, low, inv_step, lam):
    """Linear-reconstruction sample of a uniform-grid spectrum; 0 outside.

    values: f32[..., K] table (leading dims broadcast against ``lam``).
    lam:    f32[...] wavelengths in nm.
    Matches reference src/spectrum.cpp:39-60.
    """
    x = (lam - low) * inv_step
    i0f = jnp.floor(x)
    frac = x - i0f
    i0 = i0f.astype(jnp.int32)
    n = values.shape[-1]
    v0 = jnp.where((i0 >= 0) & (i0 < n), jnp.take(values, jnp.clip(i0, 0, n - 1), axis=-1), 0.0)
    i1 = i0 + 1
    v1 = jnp.where((i1 >= 0) & (i1 < n), jnp.take(values, jnp.clip(i1, 0, n - 1), axis=-1), 0.0)
    return v0 * (1.0 - frac) + v1 * frac


def sample_nearest(values, low, inv_step, lam):
    """Nearest-reconstruction sample; 0 outside (reference src/spectrum.cpp:29-38)."""
    i = jnp.round((lam - low) * inv_step).astype(jnp.int32)
    n = values.shape[-1]
    ok = (i >= 0) & (i < n)
    return jnp.where(ok, jnp.take(values, jnp.clip(i, 0, n - 1), axis=-1), 0.0)


def hero_lams_soa(lam0, n_wavelengths: int, lambda_step: float):
    """f32[N] -> f32[S, N] hero wavelengths, lane-last layout (reference
    src/spectrum.cpp:61-67)."""
    offs = jnp.arange(n_wavelengths, dtype=jnp.float32) * lambda_step
    return lam0[None, :] + offs[:, None]


def hat_weights(x, k_dim: int):
    """x: f32[..., N] fractional table coordinate -> f32[K, ..., N] linear
    reconstruction ('hat' basis) weights.  sum_k table[k] * hat(x - k) is
    exactly linear interpolation with zero outside the table -- the
    reference's reconstruction semantics (src/spectrum.cpp:39-60) as a fused
    multiply-reduce instead of per-lane gathers."""
    import jax

    iota = jax.lax.broadcasted_iota(jnp.float32, (k_dim,) + (1,) * x.ndim, 0)
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[None] - iota))


def hero_wavelengths(lambda_0, n_wavelengths: int, lambda_step: float):
    """lambda_i = lambda_0 + i * LAMBDA_STEP, i in [0, n) (reference
    src/spectrum.cpp:61-67).  lambda_0: f32[...] -> f32[..., n]."""
    offsets = jnp.arange(n_wavelengths, dtype=lambda_0.dtype) * lambda_step
    return lambda_0[..., None] + offsets


def sample_hero(table: SpectrumTable, lambda_0, n_wavelengths: int, lambda_step: float):
    """Hero-wavelength gather: f32[...] -> f32[..., n_wavelengths]."""
    lams = hero_wavelengths(lambda_0, n_wavelengths, lambda_step)
    return sample_linear(table.values, table.low, table.inv_step, lams)


def sample_hero_batched(values, low, inv_step, lambda_0, n_wavelengths: int, lambda_step: float):
    """Hero gather from *per-item* spectra.

    values: f32[..., K]; low, inv_step: f32[...] (per item); lambda_0: f32[...].
    Returns f32[..., n_wavelengths].  Used for per-material spectra where each
    material has its own wavelength range (e.g. cornell wall spectra on
    [400,700] vs D65 emission on [300,780]; reference src/scene.cpp:51,92).
    """
    lams = hero_wavelengths(lambda_0, n_wavelengths, lambda_step)  # [..., S]
    x = (lams - low[..., None]) * inv_step[..., None]
    i0f = jnp.floor(x)
    frac = x - i0f
    i0 = i0f.astype(jnp.int32)
    n = values.shape[-1]
    v0 = jnp.where(
        (i0 >= 0) & (i0 < n),
        jnp.take_along_axis(values, jnp.clip(i0, 0, n - 1), axis=-1),
        0.0,
    )
    i1 = i0 + 1
    v1 = jnp.where(
        (i1 >= 0) & (i1 < n),
        jnp.take_along_axis(values, jnp.clip(i1, 0, n - 1), axis=-1),
        0.0,
    )
    return v0 * (1.0 - frac) + v1 * frac
