#!/bin/bash
# One-shot TPU measurement roundup — run when the tunnel is healthy.
# Each step is timeout-bounded so a mid-run outage cannot wedge the shell.
# Results land in perf/*.json / BENCH artifacts; inspect then update docs.
set -x
cd "$(dirname "$0")/.."

timeout 900 python perf/tpu_kernel_numerics.py 2>&1 | tail -20
timeout 1200 python perf/parity_stage_bench.py 2>&1 | tail -25
timeout 1200 python perf/default_profile_stages.py 2>&1 | tail -15
timeout 2400 python bench.py 2>&1 | tail -3
timeout 2400 python perf/parity_decomposition.py --tpu --frames 30 \
    --json perf/parity_decomp_30f_tpu_r3default.json 2>&1 | tail -10
timeout 600 python __graft_entry__.py 2>&1 | tail -2
