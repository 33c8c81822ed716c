#!/bin/bash
# Round-17 A/B: sf0.1 full-set bench impact of the scale-safe AQE
# shuffle config (initialPartitionNum=1024, parallelismFirst=false,
# advisory 32 MB — the config commit 17cb68c measured the sf100eq star
# leg passing under) against the r16-snapshot defaults (32, true,
# 64 MB). Decides which configuration GraftSession ships (r16 verdict
# task 1): the defaults and their scaladoc must agree with the decade
# measurements, and whichever config is NOT default must be reachable
# through recorded tooling. Runs sequentially on a quiet box; each run
# is the standard full-set bench (warm pass + repeat-min).
set -e
cd /root/repo
CP="${GRAFT_CP:-target/scala-2.13/classes:target/scala-2.13/test-classes}:/opt/spark/jars/*"
JOPTS=$(grep -oE '"java.base/[a-z.]+"' build.sbt | tr -d '"' |
        sed 's/^/--add-opens /; s/$/=ALL-UNNAMED/' | tr '\n' ' ')
run() { # label extra-env...
  local label="$1"; shift
  echo "=== $label $(date -u +%H:%M:%S) ==="
  rm -f target/bench.json
  # shellcheck disable=SC2086
  env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 "$@" \
    java $JOPTS -Xmx32g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
      > "/tmp/aqe_ab_${label}.log" 2>&1
  cp target/bench.json "/tmp/aqe_ab_${label}.json"
  python3 -c "import json; d=json.load(open('/tmp/aqe_ab_${label}.json')); print(f\"$label: total={d['value']:.1f}s ok={d['ok']} warmup={d['warmup_sec']:.0f}s gc_total={d['gc_total_ms']/1000:.1f}s cpu_vs_wall={d['cpu_vs_wall']:.2f}\")"
}
run narrow32 SPARK_GRAFT_INITIAL_PARTITIONS=32 \
  SPARK_GRAFT_PARALLELISM_FIRST=true SPARK_GRAFT_ADVISORY_PARTITION_BYTES=67108864
run wide1024 SPARK_GRAFT_INITIAL_PARTITIONS=1024 \
  SPARK_GRAFT_PARALLELISM_FIRST=false SPARK_GRAFT_ADVISORY_PARTITION_BYTES=33554432
python3 - <<'PY'
import json
a = json.load(open('/tmp/aqe_ab_narrow32.json'))
b = json.load(open('/tmp/aqe_ab_wide1024.json'))
qa, qb = a['queries'], b['queries']
common = [k for k in qa if k in qb and qa[k] >= 0 and qb[k] >= 0]
ta, tb = sum(qa[k] for k in common), sum(qb[k] for k in common)
print(f"narrow32 total {ta:.1f}s vs wide1024 {tb:.1f}s -> ratio {tb/ta:.3f} over {len(common)} queries")
deltas = sorted(((qb[k]-qa[k], k) for k in common), reverse=True)
print("wide1024 worst regressions (s):")
for d, k in deltas[:8]: print(f"  {d:+.2f}  {k}  ({qa[k]:.2f} -> {qb[k]:.2f})")
print("wide1024 best improvements (s):")
for d, k in deltas[-4:]: print(f"  {d:+.2f}  {k}  ({qa[k]:.2f} -> {qb[k]:.2f})")
PY
