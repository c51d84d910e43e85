"""Progressive rendering with checkpoint/resume.

The reference computes all spp for a pixel in one call and its only artifact
is the final image (reference src/renderer.cpp:292-296); long renders cannot
be resumed (SURVEY.md section 5 "checkpoint/resume": none).  Here rendering
is a sequence of *passes* (a few spp each across the whole image) whose
per-pixel value sums accumulate in float64 on the host; every K passes the
accumulator checkpoints, so long/preemptible renders restart where they
stopped.  Sample keys derive from (seed, pass index), so a resumed render
produces bitwise the same estimate as an uninterrupted one.

Two accumulation backends:

* the native C++ runtime (native/framebuffer.cpp): f64 accumulator with an
  asynchronous background-thread checkpoint writer (binary format + a JSON
  sidecar carrying the config fingerprint), used when a C++ compiler is
  available;
* a pure-numpy fallback with synchronous .npz checkpoints.

Both produce bitwise-identical means; checkpoint files are backend-specific.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.renderer import _render_chunk, finalize_srgb
from simple_spectral_tpu.utils.metrics import RenderMetrics

_CKPT_VERSION = 1


def _cfg_fingerprint(cfg: RenderConfig, mesh=None) -> str:
    d = dataclasses.asdict(cfg)
    if mesh is not None:
        # sample streams derive from (dp, sp) shard indices, so bitwise
        # resume is only valid on the same mesh factorization
        d["_mesh"] = dict(mesh.shape)
    return json.dumps(d, sort_keys=True)


class ProgressiveRenderer:
    """Accumulates render passes; checkpointable.

    Usage::

        pr = ProgressiveRenderer(cfg, checkpoint_path="render.ckpt")
        pr.resume()                # no-op if no checkpoint exists
        pr.run()                   # renders remaining passes, checkpoints
        fb = pr.image()            # sRGB+A f32[H, W, 4]
    """

    def __init__(
        self,
        cfg: RenderConfig,
        scene=None,
        tables=None,
        seed: int = 0,
        checkpoint_path: Optional[str] = None,
        spp_per_pass: int = 4,
        native: Optional[bool] = None,
        mesh=None,
    ):
        from simple_spectral_tpu.scene.library import build_scene
        from simple_spectral_tpu.spectra.colorimetry import build_color_tables

        self.cfg = cfg
        self.tables = tables if tables is not None else build_color_tables(cfg)
        self.scene = scene if scene is not None else build_scene(cfg, self.tables)
        self.seed = seed
        self.checkpoint_path = checkpoint_path
        self.spp_per_pass = max(1, min(spp_per_pass, cfg.spp))
        # Optional jax.sharding.Mesh: passes render on the dp x sp device
        # mesh (parallel/sharding.py) instead of single-device, composing
        # mesh parallelism with checkpoint/resume and the live preview.
        # Resume determinism holds per mesh shape (sample streams derive
        # from (seed, pass, chunk, dp/sp shard index)).
        self.mesh = mesh
        if mesh is not None and mesh.shape["sp"] > 1:
            assert self.spp_per_pass % mesh.shape["sp"] == 0, (
                "spp_per_pass must divide by the sp mesh axis"
            )
        self.metrics = RenderMetrics(cfg)

        # Accumulation backend: the native C++ runtime (f64 accumulator +
        # async checkpoint writer, native/framebuffer.cpp) when buildable,
        # else numpy.  native=True forces it, native=False disables.
        self._fb = None
        if native is not False:
            try:
                from simple_spectral_tpu.utils.native_fb import NativeFramebuffer

                self._fb = NativeFramebuffer(cfg.width, cfg.height)
            except (RuntimeError, OSError):
                if native is True:
                    raise
        if self._fb is None:
            n_px = cfg.width * cfg.height
            self._sum_value = np.zeros((n_px, 3), np.float64)
            self._sum_alpha = np.zeros((n_px,), np.float64)
            self._spp_done = 0

    @property
    def native(self) -> bool:
        return self._fb is not None

    @property
    def spp_done(self) -> int:
        return self._fb.spp_done if self._fb is not None else self._spp_done

    # --- checkpointing ---

    def _sidecar(self, path: str) -> str:
        return path + ".meta.json"

    def save_checkpoint(self, path: Optional[str] = None, wait: bool = True) -> str:
        path = path or self.checkpoint_path
        assert path, "no checkpoint path configured"
        if self._fb is not None:
            with open(self._sidecar(path), "w") as f:
                json.dump(
                    {"version": _CKPT_VERSION, "cfg": _cfg_fingerprint(self.cfg, self.mesh),
                     "seed": self.seed}, f,
                )
            self._fb.checkpoint_async(path)
            if wait:
                self._fb.checkpoint_wait()
            return path
        tmp = path + ".tmp.npz"
        np.savez_compressed(
            tmp,
            version=_CKPT_VERSION,
            cfg=_cfg_fingerprint(self.cfg, self.mesh),
            seed=self.seed,
            spp_done=self._spp_done,
            sum_value=self._sum_value,
            sum_alpha=self._sum_alpha,
        )
        os.replace(tmp, path)
        return path

    def resume(self, path: Optional[str] = None) -> bool:
        """Load state from a checkpoint; returns True if one was loaded."""
        path = path or self.checkpoint_path
        if not path or not os.path.exists(path):
            return False
        if self._fb is not None:
            with open(self._sidecar(path)) as f:
                meta = json.load(f)
            if int(meta["version"]) != _CKPT_VERSION:
                raise ValueError(f"checkpoint version {meta['version']} != {_CKPT_VERSION}")
            if meta["cfg"] != _cfg_fingerprint(self.cfg, self.mesh):
                raise ValueError("checkpoint was produced by a different RenderConfig")
            if int(meta["seed"]) != self.seed:
                raise ValueError("checkpoint seed differs")
            if not self._fb.checkpoint_load(path):
                raise ValueError(f"cannot load native checkpoint {path}")
            return True
        z = np.load(path, allow_pickle=False)
        if int(z["version"]) != _CKPT_VERSION:
            raise ValueError(f"checkpoint version {z['version']} != {_CKPT_VERSION}")
        if str(z["cfg"]) != _cfg_fingerprint(self.cfg, self.mesh):
            raise ValueError("checkpoint was produced by a different RenderConfig")
        if int(z["seed"]) != self.seed:
            raise ValueError("checkpoint seed differs")
        self._sum_value = np.asarray(z["sum_value"])
        self._sum_alpha = np.asarray(z["sum_alpha"])
        self._spp_done = int(z["spp_done"])
        return True

    # --- rendering ---

    def run_pass(self, pass_spp: Optional[int] = None) -> int:
        """Render one pass of ``pass_spp`` samples per pixel; returns the new
        spp_done."""
        cfg = self.cfg
        pass_spp = pass_spp or min(self.spp_per_pass, cfg.spp - self.spp_done)
        assert pass_spp > 0
        if self.mesh is not None:
            assert pass_spp % self.mesh.shape["sp"] == 0, (
                "pass spp must divide by the sp mesh axis; choose spp/"
                "spp_per_pass multiples of sp"
            )
        pass_idx = self.spp_done  # unique stream id per sample offset
        n_px = cfg.width * cfg.height
        dp = self.mesh.shape["dp"] if self.mesh is not None else 1
        px_per_chunk = max(1, min(n_px, cfg.max_lanes))
        px_per_chunk -= px_per_chunk % dp or 0
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), 1 + pass_idx)
        t0 = time.time()
        for c in range((n_px + px_per_chunk - 1) // px_per_chunk):
            lo = c * px_per_chunk
            hi = min(lo + px_per_chunk, n_px)
            px = jnp.arange(lo, hi, dtype=jnp.int32)
            ck = jax.random.fold_in(key, c)
            if self.mesh is not None:
                from simple_spectral_tpu.parallel.sharding import (
                    _pad_to,
                    _sharded_chunk,
                )

                px, n_real = _pad_to(px, dp)
                sum_v, sum_a = _sharded_chunk(
                    self.scene, self.tables, cfg, ck, px,
                    mesh=self.mesh, spp=pass_spp,
                )
                sum_v = np.asarray(sum_v)[:n_real]
                sum_a = np.asarray(sum_a)[:n_real]
            else:
                sum_v, sum_a = _render_chunk(self.scene, self.tables, cfg, ck, px, pass_spp)
            if self._fb is not None:
                self._fb.add_chunk(lo, np.asarray(sum_v), np.asarray(sum_a))
            else:
                self._sum_value[lo:hi] += np.asarray(sum_v, np.float64)
                self._sum_alpha[lo:hi] += np.asarray(sum_a, np.float64)
        if self._fb is not None:
            self._fb.note_pass(pass_spp)
        else:
            self._spp_done += pass_spp
        self.metrics.record_pass(pass_spp, time.time() - t0)
        return self.spp_done

    def run(self, checkpoint_every: int = 0, progress: bool = False, on_pass=None):
        """Render until cfg.spp samples are accumulated.

        ``on_pass(self)`` is invoked after every pass -- the hook behind the
        CLI's ``--window`` live preview (the reference instead re-blits its
        GL window on a timer, src/main.cpp:271-334)."""
        n_pass = 0
        while self.spp_done < self.cfg.spp:
            self.run_pass()
            n_pass += 1
            if on_pass is not None:
                on_pass(self)
            if progress:
                m = self.metrics
                print(
                    f"\rpass {n_pass}: {self.spp_done}/{self.cfg.spp} spp, "
                    f"{m.mrays_per_s:.1f} Mrays/s", end="", flush=True,
                )
            if checkpoint_every and self.checkpoint_path and n_pass % checkpoint_every == 0:
                # async on the native backend: IO overlaps the next pass
                self.save_checkpoint(wait=False)
        if progress:
            print()
        if self.checkpoint_path:
            self.save_checkpoint(wait=True)

    # --- output ---

    def mean_value(self):
        h, w = self.cfg.height, self.cfg.width
        if self._fb is not None:
            return self._fb.mean()
        spp = max(self.spp_done, 1)
        return (
            (self._sum_value / spp).reshape(h, w, 3),
            (self._sum_alpha / spp).reshape(h, w),
        )

    def image(self) -> np.ndarray:
        value, alpha = self.mean_value()
        return finalize_srgb(self.cfg, self.tables, value, alpha)

    def image_u8(self, flip_rows: bool = True) -> np.ndarray:
        """u8 RGBA via the native tonemap when available (exact sRGB gamma +
        XYZ->lRGB matrix in C++), else quantized from :meth:`image`."""
        if self._fb is not None:
            from simple_spectral_tpu.config import MODE_MENG
            from simple_spectral_tpu.spectra.colorimetry import MENG_M_XYZ_TO_RGB

            if self.cfg.mode == MODE_MENG:
                # Meng's legacy matrix with the Y-whitepoint divide folded in
                # (reference src/util/color.cpp:243-254)
                m = (MENG_M_XYZ_TO_RGB / float(self.tables.d65_rad_xyz[1])).astype(np.float32)
            elif self.cfg.spectral:
                m = np.asarray(self.tables.matr_xyz_to_lrgb, np.float32)
            else:
                m = np.eye(3, dtype=np.float32)
            return self._fb.tonemap_srgb_u8(m, flip_rows=flip_rows)
        fb = self.image()
        if flip_rows:
            fb = fb[::-1]
        return np.clip(np.round(fb * 255.0), 0, 255).astype(np.uint8)