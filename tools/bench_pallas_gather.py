"""Round-5 experiment: can a Pallas kernel beat XLA's gather engine on the
merged texel fetch?  (VERDICT r04 "Next round" item 1b.)

The question: the textured configs' dominant op is a [B*N]-index gather
from a 262144-entry table (~7.25 ns/idx isolated for 1-D u32, ~8.6 in
context; tools/pack_micro_r04.json).  The table fits VMEM many times over,
so if Mosaic exposes a faster per-lane VMEM lookup primitive, both cfg3
and cfg4 clear the 100 Mrays/s target outright.

What Mosaic actually offers (jax 0.9 lowering, _gather_lowering_rule):
``tpu.dynamic_gather`` via jnp.take_along_axis, restricted to 2-D
same-shape operands -- out[i,j] = x[idx[i,j], j] (axis 0) or
x[i, idx[i,j]] (axis 1).  An arbitrary flat index does NOT decompose into
a fixed composition of these two (the row-gather step destroys the column
coordinate needed by the lane-gather step), so full-table arbitrary
gather needs either (a) same-shape table tiling [2048, 128] with
axis-0 dynamic_gather (lane j can only fetch column j -- usable only
with index preconditioning), or (b) a one-hot MXU contraction (cost
2*T flops/lane -- only viable for SMALL tables).

Variants measured here:
  A  XLA jnp.take baseline (1-D u32), 2.36M indices x 262144-entry table
  B  Pallas axis-0 dynamic_gather, [2048,128] x [2048,128] (column-
     restricted: idx pre-masked to lane-own column) -- measures the raw
     dynamic_gather rate at full table height
  C  Pallas axis-1 dynamic_gather, [2048,128] (row-restricted)
  D  one-hot MXU gather, table sizes 512/1024/4096 (XLA einsum) --
     the small-table alternative's rate
Writes results incrementally.  Usage: python tools/bench_pallas_gather.py out.json
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.tpu_bench import measure_rtt, timeit_chained

RESULTS = []
OUT = sys.argv[1] if len(sys.argv) > 1 else None
N_IDX = 9 * 262144  # the merged-fetch index count of cfg3/cfg4
TABLE = 262144


def flush():
    if OUT:
        with open(OUT, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "n_indices": N_IDX,
                       "table_rows": TABLE, "results": RESULTS}, f, indent=1)


def record(label, dt, n=N_IDX):
    RESULTS.append({"label": label, "ms": round(dt * 1e3, 3),
                    "ns_per_index": round(dt * 1e9 / n, 3)})
    print(f"{label:48s} {dt*1e3:8.3f} ms  {dt*1e9/n:7.3f} ns/idx", flush=True)
    flush()


def chained(label, fn, x0, rtt, n=N_IDX, k=8):
    def step(state, i):
        leaf = jnp.ravel(jax.tree.leaves(state)[0])[0]
        tok = (leaf * 0).astype(jnp.uint32)  # data-dependent zero
        return fn(x0 ^ tok)

    s0 = step((jnp.zeros((), jnp.uint32),), 0)
    dt = timeit_chained(label, step, s0, K=k, rtt=rtt, quiet=True)
    record(label, dt, n)


# --- Pallas kernels -------------------------------------------------------


def _dg0_kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)


def _dg1_kernel(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)


def pallas_dg(table2d, idx2d, axis):
    kern = _dg0_kernel if axis == 0 else _dg1_kernel
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(idx2d.shape, table2d.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(table2d, idx2d)


def main():
    rtt = measure_rtt()
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)
    key = jax.random.PRNGKey(0)
    table = jax.random.randint(key, (TABLE,), 0, 1 << 30, dtype=jnp.int32
                               ).astype(jnp.uint32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N_IDX,), 0, TABLE,
                             dtype=jnp.int32).astype(jnp.uint32)

    # A: XLA baseline
    @jax.jit
    def xla_take(tok):
        out = jnp.take(table, (idx ^ tok).astype(jnp.int32), axis=0)
        return (out[:1],)

    chained("A xla 1-D u32 take (baseline)", xla_take, jnp.uint32(0), rtt)

    # B/C: Pallas dynamic_gather probes (support + rate).  Column/row
    # restricted by construction: these measure the PRIMITIVE's speed, not a
    # full arbitrary gather (see module docstring).
    t2 = table.reshape(TABLE // 128, 128)
    rows = TABLE // 128  # 2048
    hi = (idx[: rows * 128].reshape(rows, 128) >> 7) % rows
    lo = (idx[: rows * 128].reshape(rows, 128) & 127)
    for label, axis, ind in (
        ("B pallas dynamic_gather axis0 [2048,128]", 0, hi.astype(jnp.int32)),
        ("C pallas dynamic_gather axis1 [2048,128]", 1, lo.astype(jnp.int32)),
    ):
        try:
            @jax.jit
            def pg(tok, axis=axis, ind=ind):
                out = pallas_dg(t2, ind ^ tok.astype(jnp.int32), axis)
                return (out[:1, :1],)

            chained(label, pg, jnp.uint32(0), rtt, n=rows * 128)
        except Exception as e:  # noqa: BLE001
            RESULTS.append({"label": label, "error": repr(e)[:300]})
            print(f"{label}: UNSUPPORTED {repr(e)[:160]}", flush=True)
            flush()

    # D: one-hot MXU gather at small table sizes (XLA einsum), bf16 onehot.
    for tsize in (512, 1024, 4096):
        small = table[:tsize].astype(jnp.float32)
        sidx = (idx % tsize).astype(jnp.int32)

        @jax.jit
        def onehot_gather(tok, small=small, sidx=sidx, tsize=tsize):
            ii = (sidx ^ tok.astype(jnp.int32)) % tsize
            # chunk to bound the one-hot buffer at [tsize, 262144]
            outs = []
            for c in range(0, N_IDX, 262144):
                ic = ii[c:c + 262144]
                iota = jax.lax.broadcasted_iota(jnp.int32, (tsize, 1), 0)
                oh = (iota == ic[None, :]).astype(jnp.bfloat16)
                outs.append(jnp.einsum(
                    "t,tn->n", small.astype(jnp.bfloat16), oh,
                    preferred_element_type=jnp.float32))
            return (outs[0][:1],)

        chained(f"D one-hot MXU gather, table={tsize}", onehot_gather,
                jnp.uint32(0), rtt)

    flush()
    if OUT:
        print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
