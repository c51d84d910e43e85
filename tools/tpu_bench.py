"""Honest TPU timing through the axon tunnel.

Gotchas this harness works around (measured on the v5e tunnel):
- ``jax.block_until_ready`` returns once the execution is *enqueued*
  remotely, not when it completes -- naive timing loops measure dispatch
  (microseconds) for any program faster than the queue depth.
- A device->host readback costs a full tunnel round-trip (~23 ms RTT).

Method: chain K calls so call i+1 consumes a value derived from call i's
output (defeats both pipelining and any result memoization), end with one
scalar readback, subtract the separately-measured RTT, divide by K.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def measure_rtt(reps: int = 5) -> float:
    x = jnp.float32(1.0) + 0.0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _ = float(x)
        ts.append(time.time() - t0)
        x = x + 1.0
    return min(ts)


def chain_token(out) -> jnp.ndarray:
    """A data-dependent i32 scalar that is almost surely 0 at runtime but
    not constant-foldable -- XOR into the next call's key/input to force
    sequential execution."""
    leaf = jax.tree.leaves(out)[0]
    return (jnp.ravel(leaf)[0] * 1e-30).astype(jnp.int32)


def timeit_chained(label, step, state0, K: int = 15, rtt: float | None = None,
                   rays: float = 0.0, quiet: bool = False):
    """step(state, i) -> next state (device values).  Returns s/call."""
    if rtt is None:
        rtt = measure_rtt()
    s = state0
    for i in range(2):  # warm-up + compile
        s = step(s, i)
    _ = float(jnp.ravel(jax.tree.leaves(s)[0])[0])
    t0 = time.time()
    for i in range(K):
        s = step(s, i)
    _ = float(jnp.ravel(jax.tree.leaves(s)[0])[0])
    raw = time.time() - t0
    if raw < 2.0 * rtt:
        # The measured interval is dominated by the tunnel round-trip:
        # subtracting the RTT would amplify noise arbitrarily (round 4
        # published a negative per-call time this way, bvh_micro_r04.json
        # row 1).  Clamp to half the raw interval and say so -- callers
        # must chain more work per call for a meaningful number.
        print(f"WARNING: {label}: interval {raw*1e3:.2f} ms < 2x RTT "
              f"({rtt*1e3:.2f} ms); per-call time clamped, increase K or "
              "per-call work", flush=True)
        dt = max(raw - rtt, 0.5 * raw) / K
    else:
        dt = (raw - rtt) / K
    if not quiet:
        extra = f"  {rays/dt/1e6:8.1f} Mrays/s" if rays else ""
        print(f"{label:52s} {dt*1e3:9.2f} ms/call{extra}", flush=True)
    return dt
