"""Multi-host (multi-process) execution over ICI + DCN.

The reference is a single process (SURVEY.md section 5: its only concurrency
is a tile queue over std::thread).  This layer scales the same static-shard
design across *hosts*: every process calls :func:`init_distributed`, builds
the SAME global ``Mesh(("dp", "sp"))`` over ``jax.devices()`` (all chips of
all hosts -- dp is laid out host-major so a dp shard's pixels stay on one
host's chips and the sp-psum rides ICI, never DCN), renders its
addressable shard of the pixel grid, and host 0 assembles the image with an
all-gather over DCN.

Testing without a pod: every function here takes the mesh/process topology
from jax itself, so the single-process test path (8 virtual CPU devices,
``process_count == 1``) executes the identical code; the driver's
``dryrun_multichip`` additionally asserts numeric equality of the sharded
loss/grads against a single-device emulation.

Scaling-efficiency protocol (BASELINE target: >= 85% at 2+ hosts), runnable
via tools/scaling_bench.py:
  1. per-chip baseline: Mrays/s of the canonical forward+backward step on a
     1-device mesh (chained timing, tools/tpu_bench.py).
  2. N-chip single host: same step on a dp=N mesh, same *per-chip* lane
     count (weak scaling -- the renderer's natural regime: more chips render
     more pixels/samples at constant time).
  3. M hosts: one process per host, ``--coordinator host0:port``; same
     per-chip lane count again.
  efficiency(K chips) = Mrays/s(K) / (K * Mrays/s(1)).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.parallel.sharding import make_mesh, sharded_sample_sums
from simple_spectral_tpu.scene.types import SceneData
from simple_spectral_tpu.spectra.colorimetry import ColorTables


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX's multi-process runtime (DCN coordination).

    No-op for single-process runs (coordinator is None and no cluster env is
    set), so CLI paths can call this unconditionally.  On TPU pods the three
    arguments are usually auto-detected from the environment and may be
    omitted (jax.distributed.initialize contract).
    """
    if coordinator is None and num_processes is None and not os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(sp: int = 1):
    """Global (dp, sp) mesh over every chip of every host.

    ``jax.devices()`` enumerates devices process-major, so reshaping to
    (dp, sp) keeps each host's chips in contiguous dp rows: the sp-axis psum
    stays intra-host (ICI), and dp needs no collective at all during the
    forward pass (pixel shards are disjoint; only gradients cross DCN).
    """
    return make_mesh(jax.devices(), sp=sp)


def host_pixel_slice(n_px: int, dp: int) -> tuple[int, int]:
    """This process's contiguous pixel range under a dp-sharded pixel axis.

    Pixels are padded to dp * per-shard counts elsewhere; the host owns the
    rows of the dp axis that live on its addressable devices.
    """
    pc = jax.process_count()
    pi = jax.process_index()
    per = (n_px + pc - 1) // pc
    return pi * per, min((pi + 1) * per, n_px)


def render_accumulate_multihost(
    cfg: RenderConfig,
    scene: SceneData,
    tables: ColorTables,
    sp: int = 1,
    seed: int = 0,
):
    """Mesh-parallel render across all hosts; every process returns the FULL
    (value f64[H, W, 3], alpha f64[H, W]) image (replicated via allgather).

    Single-process (any device count) this is render_accumulate_sharded with
    a global mesh.  Multi-process, each host feeds only its addressable
    shards (jax.make_array_from_process_local_data) and the final assembly
    all-gathers over DCN.
    """
    mesh = global_mesh(sp=sp)
    dp = mesh.shape["dp"]
    w, h, spp = cfg.width, cfg.height, cfg.spp
    n_px = w * h
    pad = (-n_px) % dp
    px_all = np.arange(n_px + pad, dtype=np.int32)
    px_all[n_px:] = 0  # padded lanes render pixel 0; dropped below

    if jax.process_count() == 1:
        px = jnp.asarray(px_all)
    else:
        from jax.experimental import multihost_utils

        sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("dp")
        )
        px = jax.make_array_from_process_local_data(sharding, px_all)
        del multihost_utils

    key = jax.random.fold_in(jax.random.PRNGKey(seed), 0)
    sum_v, sum_a = jax.jit(
        lambda px_: sharded_sample_sums(scene, tables, cfg, mesh, key, px_, spp)
    )(px)

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        sum_v = multihost_utils.process_allgather(sum_v, tiled=True)
        sum_a = multihost_utils.process_allgather(sum_a, tiled=True)

    value = np.asarray(sum_v, np.float64)[:n_px] / spp
    alpha = np.asarray(sum_a, np.float64)[:n_px] / spp
    return value.reshape(h, w, 3), alpha.reshape(h, w)
