#!/bin/bash
# Round-3 A/B batch 2: confirm u=90112 adoption, re-test K now that the
# K*u merge sort shrank 31%, then the e2e bench that batch 1 never reached.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "=== $1 ==="
  shift
  env "$@" timeout 1800 python bench.py 2>&1 | grep -E '^\{|WARNING' || echo "(no output)"
}

run "adopted default (u=90112, expect ~42.7)"
run "K=24" BNV_BENCH_K=24
run "K=32" BNV_BENCH_K=32
echo "=== e2e (native mesh rewrites) ==="
timeout 3600 python profiling/bench_e2e.py 2>&1 | tail -12
