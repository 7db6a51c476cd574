#!/bin/bash
# Sequential rerun of the measurements queued behind the end-of-round-3
# tunnel outage. One process at a time (concurrent tunnel clients stall
# each other); generous timeouts; outputs land in benchmarks/logs/.
#
#   bash benchmarks/run_pending_tpu.sh
#
# 1. exp_cond_cost        — fixed-dispatch vs operand-traffic cond probe
# 2. exp_tm_interleaved   — A/B the small-payload reset-cond restructure
#                           against results_round3_tm_interleaved.json
# 3. exp_masked_inference — same for the fused fix_T reset path
# 4. exp_plan_narrow      — uint8 plan transfer vs the old int32 form
# 5. bench.py             — headline sanity
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
# preserve the pre-restructure records the reruns would overwrite —
# they are the "before" half of the A/B
for f in results_round3_tm_interleaved results_round3_masked_inference; do
  if [ -f "benchmarks/$f.json" ] && \
     [ ! -f "benchmarks/$f.prerestructure.json" ]; then
    cp "benchmarks/$f.json" "benchmarks/$f.prerestructure.json"
  fi
done
for exp in exp_cond_cost exp_tm_interleaved exp_masked_inference \
           exp_plan_narrow exp_lrc_tpu exp_mxu_group exp_her_masked; do
  echo "=== $exp $(date -u +%H:%M:%S)"
  timeout 3600 python "benchmarks/$exp.py" \
    > "benchmarks/logs/$exp.rerun.log" 2>&1
  echo "    exit $? ($(tail -c 200 benchmarks/logs/$exp.rerun.log | tr '\n' ' '))"
done
echo "=== bench $(date -u +%H:%M:%S)"
timeout 3600 python bench.py > benchmarks/logs/bench.rerun.log 2>&1
echo "    exit $? ($(tail -2 benchmarks/logs/bench.rerun.log | tr '\n' ' '))"
