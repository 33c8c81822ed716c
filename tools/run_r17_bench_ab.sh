#!/bin/bash
# Round-17 bench-attribution A/B (r15 task 2 / r16 task 3): on a quiet
# box, two same-code WARM runs (the r16 pre-warm methodology) and two
# same-code NO-WARM runs (the r15 incremental-build methodology), all
# full-set sf0.1, same binary. Decides:
#   (a) do two same-code quiet runs' >0.5 s per-query deltas agree in
#       identity within a methodology?
#   (b) is the warm-all-memos resident state (GC pressure during the
#       timed window) the cause of the r15->r16 ~13% aggregate drift?
#       (per-window gc_ms now in the bench JSON)
# Writes /tmp/bench_ab_{warm1,warm2,nowarm1,nowarm2}.json.
set -e
cd /root/repo
CP="${GRAFT_CP:-target/scala-2.13/classes:target/scala-2.13/test-classes}:/opt/spark/jars/*"
JOPTS=$(grep -oE '"java.base/[a-z.]+"' build.sbt | tr -d '"' |
        sed 's/^/--add-opens /; s/$/=ALL-UNNAMED/' | tr '\n' ' ')
run() { # label extra-env...
  local label="$1"; shift
  echo "=== $label $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) ==="
  rm -f target/bench.json
  # shellcheck disable=SC2086
  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 "$@" \
    java $JOPTS -Xmx32g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
      > "/tmp/bench_ab_${label}.log" 2>&1
  cp target/bench.json "/tmp/bench_ab_${label}.json"
  python3 -c "import json; d=json.load(open('/tmp/bench_ab_${label}.json')); print(f\"$label: total={d['value']:.1f}s ok={d['ok']} warm={d.get('warm')} warmup={d['warmup_sec']:.0f}s warm_gc={d['warmup_gc_ms']/1000:.1f}s gc_total={d['gc_total_ms']/1000:.1f}s cpu_vs_wall={d['cpu_vs_wall']:.2f}\")"
}
run warm1
run warm2
run nowarm1 SPARK_GRAFT_BENCH_WARM=0
run nowarm2 SPARK_GRAFT_BENCH_WARM=0
python3 tools/bench_ab_report.py /tmp/bench_ab_warm1.json /tmp/bench_ab_warm2.json \
  /tmp/bench_ab_nowarm1.json /tmp/bench_ab_nowarm2.json
