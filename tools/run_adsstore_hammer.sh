#!/bin/bash
# Round-17 done-criterion for the AdsStore prune/publish race fix:
# the racing-publishers-with-pruning hammer (plus the other three
# AdsStoreSpec cases) green across N consecutive runs on a BUSY box —
# run this while a decade leg or other heavy job loads the machine.
# Each suite run explores ~20 race iterations per hammer, so N=10
# runs ≈ 200 schedules per interleaving class.
# Usage: run_adsstore_hammer.sh [N] [out.txt]
set -e
cd /root/repo
N="${1:-10}"
OUT="${2:-/tmp/adsstore_hammer_r17.txt}"
: > "$OUT"
PASS=0
for i in $(seq 1 "$N"); do
  echo "=== hammer run $i/$N $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) ===" | tee -a "$OUT"
  LOG=$(mktemp /tmp/hammer_run.XXXXXX.log)
  if sbt -batch "testOnly graft.AdsStoreSpec" > "$LOG" 2>&1; then
    PASS=$((PASS+1))
    grep -E "^\[info\] (Tests:|Run completed)" "$LOG" | tee -a "$OUT"
    rm -f "$LOG"
  else
    echo "!!! run $i FAILED — log kept at $LOG" | tee -a "$OUT"
    grep -E "FAILED|\*\*\*" "$LOG" | head -20 | tee -a "$OUT"
  fi
done
echo "adsstore hammer: $PASS/$N consecutive suite runs green" | tee -a "$OUT"
[ "$PASS" = "$N" ]
