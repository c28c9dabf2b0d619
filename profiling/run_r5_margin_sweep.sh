#!/bin/bash
# Round-5 margin sweep, part 2 (VERDICT r4 item 4): the 56-iter candidates
# from run_r5_quality_sweep.sh land at 0.9874-0.9875 @2.5cm — 0.38pp inside
# the demo bar (0.9836), short of the 0.5pp target.  Probe the untested
# cosine lr decay (exists: trainer.optim_lr_schedule, never measured) and
# the 64-iter known-quantity fallback; validate the winner on the room
# scene.  Sequential — only one process may use the TPU.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r5_margin_sweep.jsonl
: > $OUT

run() {
  local tag="$1"; shift
  local ov="$*"
  echo "=== $tag: $ov" >> $OUT
  BNV_QG_OVERRIDES="$ov" timeout 2400 python profiling/quality_gate.py >> $OUT 2>/tmp/qg_err2.log \
    || echo "{\"tag\": \"$tag\", \"error\": true}" >> $OUT
}

run demo_cos48_lr3   "preset=fast_e2e trainer.optim_lr_schedule=cosine optimizer.lr.initial=0.003"
run demo_cos48       "preset=fast_e2e trainer.optim_lr_schedule=cosine"
run demo_64          "preset=fast_e2e trainer.global_steps=64"
run demo_cos56_lr3   "preset=fast_e2e trainer.optim_lr_schedule=cosine optimizer.lr.initial=0.003 trainer.global_steps=56"

echo DONE >> $OUT
