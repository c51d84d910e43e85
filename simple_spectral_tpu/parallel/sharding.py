"""Multi-chip rendering via a device mesh.

The reference's only parallelism is a mutex-guarded tile queue over
``std::thread`` (reference src/renderer.cpp:340-421).  The TPU-native design
replaces the dynamic queue with *static* sharding over a 2-D
``Mesh(("dp", "sp"))``:

* ``dp`` (data parallel)  -- pixel lanes sharded across chips;
* ``sp`` (sample parallel) -- samples-per-pixel sharded across chips, with a
  ``psum`` over ``sp`` reducing partial XYZ sums -- the collective rides ICI,
  mirroring how the reference's threads partition (tile, sample) work.

Scene geometry and spectral tables are replicated (SURVEY.md section 5,
"distributed communication backend").  Gradients all-reduce over the whole
mesh with a second ``psum``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simple_spectral_tpu.config import RenderConfig
from simple_spectral_tpu.render.integrator import trace_lanes
from simple_spectral_tpu.scene.types import SceneData
from simple_spectral_tpu.spectra.colorimetry import ColorTables


def make_mesh(devices=None, dp: Optional[int] = None, sp: Optional[int] = None) -> Mesh:
    """Factor the devices into a (dp, sp) mesh.  Default: all devices on dp
    (pixel parallel) -- the right default when one image has many pixels."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None and sp is None:
        dp, sp = n, 1
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    assert dp * sp == n, f"mesh {dp}x{sp} != {n} devices"
    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


def _pad_to(x, mult):
    n = x.shape[0]
    pad = (-n) % mult
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, n


def sharded_sample_sums(
    scene: SceneData,
    tables: ColorTables,
    cfg: RenderConfig,
    mesh: Mesh,
    key,
    px_flat,  # i32[N], N % dp == 0
    spp: int,  # % sp == 0
):
    """Per-pixel (sum over spp of value, sum of alpha), computed on the mesh.

    Each (dp, sp) shard traces ``spp/sp`` samples for ``N/dp`` pixels; the
    partial sums psum over ``sp``.  Output is dp-sharded, sp-replicated.
    """
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    assert px_flat.shape[0] % dp == 0 and spp % sp == 0

    def work(px_):
        # distinct sample streams per (dp, sp) shard
        di = jax.lax.axis_index("dp")
        si = jax.lax.axis_index("sp")
        kshard = jax.random.fold_in(jax.random.fold_in(key, di), si)
        px_i = px_ % cfg.width
        px_j = px_ // cfg.width

        def body(carry, k):
            acc_v, acc_a = carry
            res = trace_lanes(scene, tables, cfg, k, px_i, px_j)
            return (acc_v + res.value, acc_a + res.alpha), None

        init = (
            jnp.zeros((px_.shape[0], 3), jnp.float32),
            jnp.zeros((px_.shape[0],), jnp.float32),
        )
        keys = jax.random.split(kshard, spp // sp)
        (sum_v, sum_a), _ = jax.lax.scan(body, init, keys)
        # reduce sample-parallel partials over ICI
        sum_v = jax.lax.psum(sum_v, "sp")
        sum_a = jax.lax.psum(sum_a, "sp")
        return sum_v, sum_a

    # check_vma=False: the integrator's scan seeds constant carries that the
    # varying-axes checker would reject; classic shard_map semantics are fine
    # here (replication is enforced by the explicit psums).
    shard = jax.shard_map(
        work,
        mesh=mesh,
        in_specs=(P("dp"),),
        out_specs=(P("dp"), P("dp")),
        check_vma=False,
    )
    return shard(px_flat)


@partial(jax.jit, static_argnums=(2,), static_argnames=("mesh", "spp"))
def _sharded_chunk(scene, tables, cfg, key, px_flat, *, mesh, spp):
    return sharded_sample_sums(scene, tables, cfg, mesh, key, px_flat, spp)


def render_accumulate_sharded(
    cfg: RenderConfig,
    scene: SceneData,
    tables: ColorTables,
    mesh: Mesh,
    seed: int = 0,
):
    """Mesh-parallel version of render.renderer.render_accumulate.

    Returns (value f64[H, W, 3], alpha f64[H, W]), row 0 at bottom.
    """
    from simple_spectral_tpu.render.renderer import render_chunk_lanes

    w, h, spp = cfg.width, cfg.height, cfg.spp
    dp = mesh.shape["dp"]
    n_px = w * h
    key = jax.random.PRNGKey(seed)
    # memory is O(lanes) per device (the sample loop scans; see
    # render.renderer.render_chunk_lanes)
    px_per_chunk = min(n_px, render_chunk_lanes(cfg, scene) * dp)
    # round chunk to a multiple of dp
    px_per_chunk -= px_per_chunk % dp or 0

    value = np.zeros((n_px, 3), np.float64)
    alpha = np.zeros((n_px,), np.float64)
    n_chunks = (n_px + px_per_chunk - 1) // px_per_chunk
    for c in range(n_chunks):
        lo = c * px_per_chunk
        hi = min(lo + px_per_chunk, n_px)
        px = jnp.arange(lo, hi, dtype=jnp.int32)
        px, n_real = _pad_to(px, dp)
        ck = jax.random.fold_in(key, c)
        sum_v, sum_a = _sharded_chunk(scene, tables, cfg, ck, px, mesh=mesh, spp=spp)
        value[lo:hi] = np.asarray(sum_v, np.float64)[:n_real] / spp
        alpha[lo:hi] = np.asarray(sum_a, np.float64)[:n_real] / spp
    return value.reshape(h, w, 3), alpha.reshape(h, w)


def sharded_loss_and_grad(
    scene: SceneData,
    tables: ColorTables,
    cfg: RenderConfig,
    mesh: Mesh,
    key,
    px_flat,
    target,  # f32[N, 3] per-pixel target value (XYZ / lRGB)
    spp: int,
):
    """One differentiable "training step": forward render + L2 loss against a
    target image + gradients w.r.t. the material tables, all on the mesh.

    Gradients of replicated parameters are psum-reduced over both mesh axes
    (the reference has no analog; this is the BASELINE.json north-star
    'parameter gradients all-reduced via psum' path).

    Returns (loss scalar, grads pytree like scene.materials).
    """
    import dataclasses

    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    n = px_flat.shape[0]
    # The differentiable leaves (SURVEY.md C7: material spectra/RGB are the
    # framework's parameters); integer id/type columns stay out of grad.
    DIFF_FIELDS = ("albedo_values", "emission_values", "albedo_rgb", "emission_rgb")
    params0 = {f: getattr(scene.materials, f) for f in DIFF_FIELDS}

    def work(params, px_, tgt_):
        di = jax.lax.axis_index("dp")
        si = jax.lax.axis_index("sp")
        kshard = jax.random.fold_in(jax.random.fold_in(key, di), si)
        px_i = px_ % cfg.width
        px_j = px_ // cfg.width

        def local_loss(prm):
            mats = dataclasses.replace(scene.materials, **prm)
            s2 = dataclasses.replace(scene, materials=mats)

            # unrolled, not lax.scan: transposing a scan costs ~2.1x the
            # per-sample backward (see render/trainstep.py _loss_fn); RNG
            # stream (split + in-order consumption) is identical either way
            keys = jax.random.split(kshard, spp // sp)
            sum_v = jnp.zeros((px_.shape[0], 3), jnp.float32)
            for i in range(spp // sp):
                sum_v = sum_v + trace_lanes(s2, tables, cfg, keys[i], px_i, px_j).value
            mean_v = jax.lax.psum(sum_v, "sp") / spp
            # mean over all pixels: local sum / global count
            return jnp.sum((mean_v - tgt_) ** 2) / (3.0 * n)

        loss, grads = jax.value_and_grad(local_loss)(params)
        # Pixel shards are disjoint -> total loss = psum over dp (the sp
        # replicas already agree after the forward psum).  Gradients: each
        # (dp, sp) shard's backward covers only its own samples' path, BUT
        # the transpose of the forward sp-psum re-broadcasts the cotangent of
        # mean_v from every sp replica's (identical) local loss, so each
        # shard's grad already carries a factor sp; the all-reduce over both
        # axes must divide it back out.  (Caught by the dryrun's
        # single-device emulation check: grads were exactly sp x too large.)
        loss = jax.lax.psum(loss, "dp")
        grads = jax.tree.map(
            lambda g: jax.lax.psum(g, ("dp", "sp")) / sp, grads
        )
        return loss, grads

    shard = jax.shard_map(
        work,
        mesh=mesh,
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return shard(params0, px_flat, target)


def emulated_loss_and_grad(
    scene: SceneData,
    tables: ColorTables,
    cfg: RenderConfig,
    dp: int,
    sp: int,
    key,
    px_flat,
    target,
    spp: int,
):
    """Single-device re-computation of :func:`sharded_loss_and_grad`'s exact
    value: same per-(dp, sp)-shard fold_in RNG streams, same reduction
    structure, no mesh.  The multichip dryrun asserts the sharded program
    equals this to f32 reduction-order tolerance -- a value-correctness
    check, not a sanity check."""
    import dataclasses

    n = px_flat.shape[0]
    per = n // dp
    DIFF_FIELDS = ("albedo_values", "emission_values", "albedo_rgb", "emission_rgb")
    params0 = {f: getattr(scene.materials, f) for f in DIFF_FIELDS}

    def total_loss(params):
        mats = dataclasses.replace(scene.materials, **params)
        s2 = dataclasses.replace(scene, materials=mats)
        loss = jnp.float32(0.0)
        for di in range(dp):
            px_ = jax.lax.dynamic_slice_in_dim(px_flat, di * per, per)
            tgt_ = jax.lax.dynamic_slice_in_dim(target, di * per, per)
            px_i, px_j = px_ % cfg.width, px_ // cfg.width
            sum_v = jnp.zeros((per, 3), jnp.float32)
            for si in range(sp):
                kshard = jax.random.fold_in(jax.random.fold_in(key, di), si)
                for k in jax.random.split(kshard, spp // sp):
                    res = trace_lanes(s2, tables, cfg, k, px_i, px_j)
                    sum_v = sum_v + res.value
            mean_v = sum_v / spp
            loss = loss + jnp.sum((mean_v - tgt_) ** 2) / (3.0 * n)
        return loss

    return jax.value_and_grad(total_loss)(params0)
