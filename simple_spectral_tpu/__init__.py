"""simple-spectral-tpu: a TPU-native differentiable spectral path tracer in JAX.

A from-scratch re-design of the capabilities of geometrian/simple-spectral
(Mallett & Yuksel 2019, "Spectral Primary Decomposition for Rendering with
sRGB Reflectance", EGSR 2019) as an idiomatic JAX/XLA/Pallas framework:

* four color pipelines -- Mallett-Yuksel sRGB spectral-primary basis
  ("mallett"), Meng et al. 2015 spectral upsampling ("meng"), Jakob & Hanika
  2019 polynomial sigmoid coefficients ("jakob"), and classic RGB ("rgb") --
  selected at *runtime* via :class:`RenderConfig` (the reference selects them
  at compile time, reference src/stdafx.hpp:63-93);
* hero-wavelength Monte Carlo light transport as a wavefront integrator
  (flat path-state arrays + ``lax.scan`` over bounce depth) instead of the
  reference's recursive per-ray C++ (reference src/renderer.cpp:104-308);
* differentiable end-to-end w.r.t. material reflectance/emission spectra;
* multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` with psum
  reductions (the reference's analog is a mutex-guarded tile queue over
  std::thread, reference src/renderer.cpp:340-421).
"""

from simple_spectral_tpu.config import RenderConfig

__version__ = "0.1.0"

__all__ = ["RenderConfig", "__version__"]
