#!/bin/bash
# Round-4 TPU measurement session: run everything in one tunnel window,
# sequentially (ONE jax process at a time), artifacts written incrementally.
# Usage: bash tools/r04_tpu_session.sh
set -x
cd "$(dirname "$0")/.."

# 1. modes re-measure (validates the merged-gather + shifted-window wins)
timeout 1500 python -u tools/perf_modes_r04.py tools/modes_r04d.json all

# 2. headline benchmark (median of 3 x 32 calls, equal lanes)
timeout 2400 python -u bench.py 2>bench_r04_stderr.log; tail -5 bench_r04_stderr.log

# 3. block-cull crossover benchmark (compiled Mosaic first run on HW)
timeout 2400 python -u tools/bench_cull_micro.py tools/cull_micro_r04.json

echo DONE
