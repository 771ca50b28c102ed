#!/bin/bash
# Round-4 evidence stage (VERDICT r3 item 1) as ONE serial, resumable
# script: rounds 2 and 3 both lost their evidence to end-of-round TPU
# outages, so every measurement now runs through here the moment the
# tunnel answers, each step logged and marked done so a mid-run outage
# resumes instead of restarting.
#
#   tools/evidence_r4.sh sweep   # phase 1: wave-5/6 profile measurements
#   (builder reads results, flips measured winners, runs --quick-gate)
#   tools/evidence_r4.sh full    # phase 2: reproduce sweeps, fleet table,
#                                # AM closed loop, bench schema
#
# Launch nohup'd and poll the log (harness-foreground TPU runs get killed,
# backgrounded ones can freeze — memory/axon-host-gotchas):
#   (nohup tools/evidence_r4.sh sweep > /tmp/evidence_sweep.log 2>&1 &)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
MARK=results/r4_markers
mkdir -p "$MARK" results

step() {  # step <name> <cmd...>: run once, mark, abort on backend-down
  local name="$1"; shift
  if [ -f "$MARK/$name" ]; then echo "== $name: already done, skip"; return 0; fi
  echo "== $name: start $(date -u +%H:%M:%S)"
  "$@"
  local rc=$?
  if [ $rc -eq 2 ]; then
    echo "== $name: BACKEND UNAVAILABLE (rc=2) — aborting phase"; exit 2
  fi
  if [ $rc -ne 0 ]; then
    echo "== $name: FAILED rc=$rc — continuing to next step"; return $rc
  fi
  touch "$MARK/$name"
  echo "== $name: done $(date -u +%H:%M:%S)"
}

phase_sweep() {
  step sweep_profile python -u tools/profile_step.py --size 512 --iters 50 \
    --only bf16_auto,bf16_s2dwide,bf16_dotsvjp,bf16_s2dw_dvjp,bf16_bnsumsq,f32_upconv_off,f32_s2d,f32_bnsumsq
  echo "== sweep phase complete; read results/profile.jsonl, flip winners,"
  echo "== run: python tools/reproduce.py --quick-gate, then: $0 full"
}

phase_full() {
  # 1. full f32 reproduce sweep (shipped defaults)
  step reproduce_f32 python -u tools/reproduce.py
  # 2. bf16 quality rows for the headline recipes
  step reproduce_bf16 python -u tools/reproduce.py \
    --only f16,kate,zebra4,barbara --compute-dtype bfloat16
  # 3. AM closed loop on the trained backbone (argmax/margin row)
  step am_closed_loop python -u tools/train_backbone.py --skip-train --skip-fi
  # 4. multi-image fleet SR table
  step fleet_set python -u tools/make_fleet_set.py
  step fleet_eval bash -c "python -u -m dip_tpu eval-sr \
    --dir results/sr_fleet_set --factor 4 --fleet \
    | tee results/eval_sr_x4_fleet.txt"
  # 5. regenerate RESULTS.md from the fresh records
  step make_results python -u tools/make_results.py
  # 6. the 3-row bench schema (rows stream as they complete)
  step bench bash -c "python -u bench.py | tee results/bench_r4.jsonl"
  echo "== full phase complete $(date -u +%H:%M:%S)"
}

case "${1:-}" in
  sweep) phase_sweep ;;
  full)  phase_full ;;
  *) echo "usage: $0 {sweep|full}"; exit 1 ;;
esac
