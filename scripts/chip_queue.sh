#!/bin/bash
# Serial TPU job queue for the tunneled chip (compiles serialize, so one job
# at a time). Run in background; outputs land in /tmp/q_*.out.
set -x
cd /root/repo

run() {
  name=$1; shift
  timeout "$1" "${@:2}" > "/tmp/q_${name}.out" 2> "/tmp/q_${name}.err"
  echo "=== ${name}: exit $? ===" >> /tmp/q_status.log
}

echo "queue start $(date)" > /tmp/q_status.log

# 1. verify (smoke e2e on chip)
run smoke 1800 python examples/smoke_e2e.py

# 2. headline bench with flip-k reverse plans
run bench_flip 5400 python bench.py

# 3. pre-populate the autotune cache on real maps at every level
WARPCONVNET_TPU_BENCHMARK_CACHE_DIR=data run tune 10800 \
  python scripts/tune_bench_cache.py

# 4. bench again, riding the committed cache winners
run bench_tuned 5400 python bench.py

# 5. per-model steady-state table (+ grouped-conv ablation)
run models 10800 python scripts/model_steady_state.py

# 6. large-kernel plan ratios (5^3 / 7^3 vs 3^3)
run k125 5400 python scripts/perf_k125.py

# 7. TRELLIS.2 pipeline at published shapes
run trellis 10800 python scripts/trellis2_ref_shape.py

# 8. step decomposition at the final state
WCT_BENCH_ALGO=auto run decomp 5400 python scripts/step_decompose.py

echo "queue done $(date)" >> /tmp/q_status.log
