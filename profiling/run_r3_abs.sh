#!/bin/bash
# Round-3 pending hardware A/Bs (see RESULTS.md "Pending hardware A/Bs").
# Run on a quiet host with a live TPU tunnel:  bash profiling/run_r3_abs.sh
# Each step prints the bench JSON line; later steps reuse the jit cache.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $1 ==="
  shift
  BNV_BENCH_OVERRIDES="$*" timeout 1800 python bench.py 2>/dev/null
}

run "baseline (39.0 fps expected)"
run "sort1_gather"        model.fuse_sort1_gather=true
run "u_cell 57344"        model.max_unique_cells_per_frame=57344
run "u 90112"             model.max_unique_per_frame=90112
run "all three"           model.fuse_sort1_gather=true \
                          model.max_unique_cells_per_frame=57344 \
                          model.max_unique_per_frame=90112

echo "=== e2e (native mesh rewrites; expect mesh phase ~2s) ==="
timeout 3600 python profiling/bench_e2e.py 2>/dev/null | tail -8
