"""Parse a jax.profiler xplane.pb directly (no tensorboard converter):
aggregate device-plane event durations by op name, print the top rows.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python tools/parse_xplane.py <file.xplane.pb> [top_n]
"""

import collections
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

xspace = xplane_pb2.XSpace()
with open(path, "rb") as f:
    xspace.ParseFromString(f.read())

for plane in xspace.planes:
    if "TPU" not in plane.name and "/device" not in plane.name.lower():
        continue
    print(f"=== plane: {plane.name} ===")
    ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
    totals = collections.defaultdict(float)
    counts = collections.defaultdict(int)
    for line in plane.lines:
        # XLA op lines carry per-HLO events; pick the line with HLO detail
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            dur_ms = ev.duration_ps / 1e9
            totals[(line.name, name)] += dur_ms
            counts[(line.name, name)] += 1
    by_line = collections.defaultdict(list)
    for (ln, name), ms in totals.items():
        by_line[ln].append((ms, name, counts[(ln, name)]))
    for ln, rows in by_line.items():
        rows.sort(reverse=True)
        tot = sum(r[0] for r in rows)
        print(f"--- line: {ln}  total {tot:.2f} ms, {len(rows)} distinct ops")
        for ms, name, c in rows[:top_n]:
            print(f"  {ms:9.3f} ms  x{c:<4d} {name[:120]}")
