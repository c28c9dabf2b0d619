#!/bin/bash
# Round-5 quality sweep (VERDICT r4 item 4): restore margin at the shipped
# e2e operating point and gate on TWO synthetic scenes so the bar is not
# single-scene-overfit.  Sequential — only one process may use the TPU.
#
# Rows:
#   demo scene: reference-formula anchor (exists: 0.9935/0.9044), shipped
#     fast_e2e point (exists: 0.9846/0.9273), candidates 14/4 and 56 iters
#     and 12/4@56
#   room scene: reference-formula anchor, shipped point, winning candidate
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r5_quality_sweep.jsonl
: > $OUT

run() {
  local tag="$1"; shift
  local ov="$*"
  echo "=== $tag: $ov" >> $OUT
  BNV_QG_OVERRIDES="$ov" timeout 2400 python profiling/quality_gate.py >> $OUT 2>/tmp/qg_err.log \
    || echo "{\"tag\": \"$tag\", \"error\": true}" >> $OUT
}

# candidates on the demo scene (anchor measured r3; shipped re-gated here
# because the preset now also flips parallel_ray_chunks -> sequential,
# which is the exact reference chunk schedule)
run demo_shipped   "preset=fast_e2e"
run demo_14_4_48   "preset=fast_e2e model.ray_tracer.n_fine=14"
run demo_12_4_56   "preset=fast_e2e trainer.global_steps=56"
run demo_14_4_56   "preset=fast_e2e model.ray_tracer.n_fine=14 trainer.global_steps=56"

# room scene: reference-formula anchor, then shipped, then candidate
run room_anchor    "dataset=synthetic_room"
run room_shipped   "dataset=synthetic_room preset=fast_e2e"
run room_14_4_56   "dataset=synthetic_room preset=fast_e2e model.ray_tracer.n_fine=14 trainer.global_steps=56"

echo DONE >> $OUT
