"""Quick smoke render for development; run on forced-CPU backend."""
import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.io.image import save_image
from simple_spectral_tpu.render.renderer import render_image

mode = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "rgb"
scene = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("-") else "cornell"
size = int(sys.argv[3]) if len(sys.argv) > 3 and not sys.argv[3].startswith("-") else 64
spp = int(sys.argv[4]) if len(sys.argv) > 4 and not sys.argv[4].startswith("-") else 4

cfg = RenderConfig(scene=scene, width=size, height=size, spp=spp, mode=mode)
t0 = time.time()
fb = render_image(cfg, progress=True)
print(f"render took {time.time()-t0:.1f}s")
print("srgb stats: min", fb[..., :3].min(), "max", fb[..., :3].max(), "mean", fb[..., :3].mean())
print("alpha mean:", fb[..., 3].mean())
# row 0 is bottom; sample a few regions
h, w = fb.shape[:2]
print("center px:", fb[h // 2, w // 2])
print("left-middle (should be red-ish in cornell):", fb[h // 2, w - 5])
print("right-middle (should be green-ish in cornell):", fb[h // 2, 5])
out = f"/tmp/smoke_{scene}_{mode}_{size}.png"
save_image(out, fb)
print("saved", out)
