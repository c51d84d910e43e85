"""Structured metrics & observability.

The reference's only observability is a throttled progress/ETA line on
stderr (reference src/renderer.cpp:53-101); SURVEY.md section 5 calls for a
structured metrics dict (rays traced, Mrays/s, scaling efficiency) emitted
as JSON for baseline comparisons.  Ray accounting uses the reference's own
upper bound: 1 camera ray + (MAX_DEPTH-1) x (1 shadow + 1 BSDF) intersects
per sample with ELS on (BASELINE.md), MAX_DEPTH intersects with ELS off.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import List, Optional

from simple_spectral_tpu.config import RenderConfig


def rays_per_sample(cfg: RenderConfig) -> int:
    return 2 * cfg.max_depth - 1 if cfg.els else cfg.max_depth


@dataclasses.dataclass
class RenderMetrics:
    cfg: RenderConfig
    spp_done: int = 0
    wall_s: float = 0.0
    pass_times: List[float] = dataclasses.field(default_factory=list)

    def record_pass(self, pass_spp: int, seconds: float) -> None:
        self.spp_done += pass_spp
        self.wall_s += seconds
        self.pass_times.append(seconds)

    @property
    def rays_traced(self) -> int:
        return self.cfg.width * self.cfg.height * self.spp_done * rays_per_sample(self.cfg)

    @property
    def mrays_per_s(self) -> float:
        return self.rays_traced / self.wall_s / 1e6 if self.wall_s > 0 else 0.0

    def to_dict(self) -> dict:
        c = self.cfg
        return {
            "scene": c.scene,
            "mode": c.mode,
            "observer": c.observer,
            "resolution": [c.width, c.height],
            "spp": self.spp_done,
            "max_depth": c.max_depth,
            "els": c.els,
            "rays_traced": self.rays_traced,
            "wall_s": round(self.wall_s, 4),
            "mrays_per_s": round(self.mrays_per_s, 3),
            "n_passes": len(self.pass_times),
        }

    def to_json(self) -> str:
        return json.dumps(self.to_dict())


class Timer:
    """Wall-clock timing helper that blocks on device results, for honest
    device-side measurements (`jax.block_until_ready` harness per SURVEY.md
    section 5 tracing/profiling)."""

    def __init__(self):
        self.t0 = None
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self.t0
        return False

    def stop(self, result=None):
        if result is not None:
            import jax

            jax.block_until_ready(result)
        self.elapsed = time.time() - self.t0
        return self.elapsed
