"""Subprocess worker for tests/test_multihost.py::test_two_process_cpu.

Runs as one process of a 2-process JAX CPU cluster (Gloo collectives over
the distributed runtime), renders via render_accumulate_multihost, and
writes the full assembled image to an npz for the parent to compare.

Usage: python _multihost_worker.py <process_id> <num_processes> <port> <out.npz>
"""

import os
import sys


def main():
    pid, nproc, port, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    # initialize the cluster BEFORE importing the package (imports may touch
    # the backend, and jax.distributed.initialize must run first)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    from simple_spectral_tpu.parallel.multihost import render_accumulate_multihost

    import numpy as np

    from simple_spectral_tpu.config import RenderConfig
    from simple_spectral_tpu.scene.library import build_scene
    from simple_spectral_tpu.spectra.colorimetry import build_color_tables

    cfg = RenderConfig(scene="cornell", mode="mallett", width=16, height=16,
                       spp=8, max_depth=4)
    tables = build_color_tables(cfg)
    scene = build_scene(cfg, tables)
    value, alpha = render_accumulate_multihost(cfg, scene, tables, sp=2, seed=7)
    np.savez(out_path, value=value, alpha=alpha)
    print(f"proc {pid}: wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
