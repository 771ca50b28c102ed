#!/bin/bash
# Round-5 evidence stage: one serial, resumable script (same pattern as
# tools/evidence_r4.sh — every measurement marker-gated so a mid-run
# tunnel outage resumes instead of restarting).
#
# Round-5 defaults changed (wave 9.7 dgrad rewrite; wave 10 f32 -> dots
# lowering + mixed-precision Pallas seam), so the full reproduce sweeps
# and RESULTS.md must be regenerated at the new HEAD.
#
#   tools/evidence_r5.sh full
#
# Launch nohup'd and poll the log:
#   (nohup tools/evidence_r5.sh full > /tmp/evidence_r5.log 2>&1 &)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
MARK=results/r5_markers
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

phase_full() {
  # 1. full f32 reproduce sweep at the wave-10 defaults
  step reproduce_f32 python -u tools/reproduce.py
  # 2. bf16 quality rows for the headline recipes
  step reproduce_bf16 python -u tools/reproduce.py \
    --only f16,kate,zebra4,barbara --compute-dtype bfloat16
  # 3. multi-image fleet SR table at the new defaults
  step fleet_set python -u tools/make_fleet_set.py
  step fleet_eval bash -c "python -u -m dip_tpu eval-sr \
    --dir results/sr_fleet_set --factor 4 --fleet \
    | tee results/eval_sr_x4_fleet.txt"
  # 4. regenerate RESULTS.md from the fresh records
  step make_results python -u tools/make_results.py
  # 5. the 3-row bench schema + headline sync (single source of truth)
  step bench bash -c "python -u bench.py | tee -a results/bench_r5.jsonl"
  step sync_headlines python -u tools/sync_headlines.py
  echo "== full phase complete $(date -u +%H:%M:%S)"
}

case "${1:-}" in
  full)  phase_full ;;
  *) echo "usage: $0 full"; exit 1 ;;
esac
