"""Capture a jax.profiler device trace of the canonical forward step and
print the per-HLO-op time breakdown (needs tensorboard_plugin_profile).

Usage: python tools/profile_fwd.py [fwd|bwd]
"""

import glob
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.renderer import _render_chunk
from simple_spectral_tpu.render.trainstep import forward_backward_step
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables

which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
cfg_name = sys.argv[2] if len(sys.argv) > 2 else "canonical"
CFGS = {
    "canonical": RenderConfig(scene="cornell-srgb", mode="mallett", width=512,
                              height=512, spp=64),
    "jakob": RenderConfig(scene="plane-srgb", mode="jakob", width=512,
                          height=512, spp=64, els=False),
    "meng": RenderConfig(scene="cornell-srgb", mode="meng", observer=2006,
                         width=256, height=256, spp=64),
}
cfg = CFGS[cfg_name]
tables = build_color_tables(cfg)
scene = build_scene(cfg, tables)
key = jax.random.PRNGKey(0)
n = 262144
px = jnp.arange(n, dtype=jnp.int32)
tgt = jnp.zeros((n, 3), jnp.float32)

if which == "fwd":
    step = lambda k: _render_chunk(scene, tables, cfg, k, px, 1)
else:
    step = lambda k: forward_backward_step(scene, tables, cfg, k, px, tgt, 1)

out = step(key)
jax.block_until_ready(out)

logdir = "/tmp/ss_trace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
for i in range(3):
    out = step(jax.random.fold_in(key, i))
jax.block_until_ready(out)
jax.profiler.stop_trace()

# parse the xplane protobuf into an op profile table
files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", files)
if files:
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("framework_op_stats", "hlo_op_stats", "op_profile"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(files, tool, {})
            out_path = f"/tmp/ss_trace_{tool}.out"
            with open(out_path, "wb") as f:
                f.write(data if isinstance(data, bytes) else str(data).encode())
            print(f"wrote {out_path} ({len(data)} bytes)")
        except Exception as e:  # noqa: BLE001
            print(f"{tool}: FAILED {repr(e)[:200]}")
