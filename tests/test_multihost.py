"""Multi-host layer (parallel/multihost.py).

Two levels of checking on the CPU host:
  1. single-process: render_accumulate_multihost on the virtual 8-device
     mesh must equal render_accumulate_sharded bitwise (same chunk loop,
     same per-shard fold_in streams);
  2. real 2-process cluster (Gloo over the JAX distributed runtime, 4
     virtual devices per process = same 8-device global mesh): every process
     must assemble the same full image as the single-process run -- this
     exercises jax.make_array_from_process_local_data and the cross-process
     all-gather, i.e. the actual DCN code path of SURVEY.md section 5.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.parallel.multihost import (
    global_mesh,
    render_accumulate_multihost,
)
from simple_spectral_tpu.parallel.sharding import make_mesh, render_accumulate_sharded
from simple_spectral_tpu.scene.library import build_scene
from simple_spectral_tpu.spectra.colorimetry import build_color_tables


@pytest.fixture(scope="module")
def setup():
    cfg = RenderConfig(scene="cornell", mode="mallett", width=16, height=16,
                       spp=8, max_depth=4)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    return cfg, scene, tables


def test_global_mesh_shape():
    assert global_mesh(sp=2).shape == {"dp": 4, "sp": 2}


def test_single_process_matches_sharded(setup):
    cfg, scene, tables = setup
    v_mh, a_mh = render_accumulate_multihost(cfg, scene, tables, sp=2, seed=7)
    v_sh, a_sh = render_accumulate_sharded(cfg, scene, tables, make_mesh(sp=2), seed=7)
    np.testing.assert_array_equal(v_mh, v_sh)
    np.testing.assert_array_equal(a_mh, a_sh)


def test_single_process_chunked_matches_sharded(setup):
    """max_lanes small enough to force multiple chunks: both paths share the
    chunk-size formula and per-chunk fold_in, so they stay bitwise equal."""
    cfg, scene, tables = setup
    cfg_small = cfg.replace(max_lanes=16 * 8)  # 16 px/chunk at spp 8
    v_mh, a_mh = render_accumulate_multihost(cfg_small, scene, tables, sp=1, seed=7)
    v_sh, a_sh = render_accumulate_sharded(cfg_small, scene, tables, make_mesh(sp=1), seed=7)
    np.testing.assert_array_equal(v_mh, v_sh)
    np.testing.assert_array_equal(a_mh, a_sh)


@pytest.mark.slow
def test_two_process_cpu(setup, tmp_path):
    """Spawn a real 2-process CPU cluster and compare each process's
    assembled image against the single-process multihost render."""
    cfg, scene, tables = setup
    ref_v, ref_a = render_accumulate_multihost(cfg, scene, tables, sp=2, seed=7)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    outs = [str(tmp_path / f"proc{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), outs[i]],
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    for i in range(2):
        got = np.load(outs[i])
        # same 8-device global mesh => same per-shard RNG streams; f32
        # reduction order may differ across the process boundary
        np.testing.assert_allclose(got["value"], ref_v, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(got["alpha"], ref_a, rtol=0, atol=1e-6)
