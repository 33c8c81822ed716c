#!/bin/bash
# A/B the AQE initialPartitionNum on the sf100eq min-label components
# leg (r16 debugging): same pairs memo, fresh closure build each side.
cd /root/repo
CP="target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/*"
JOPTS=$(grep -oE '"java.base/[a-z.]+"' build.sbt | tr -d '"' | sed 's/^/--add-opens /; s/$/=ALL-UNNAMED/' | tr '\n' ' ')
for ip in "$@"; do
  echo "=== initial=$ip $(date -u +%H:%M:%S)"
  rm -rf /tmp/memo_r16_debug/graft.materialized/_tmp_sf100eq/dedup.components
  rm -f target/bench.json
  env SPARK_GRAFT_SF_DIR=/tmp/sf100eq SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_MEMO_LEVEL=PARQUET SPARK_GRAFT_MEMO_DIR=/tmp/memo_r16_debug \
    SPARK_GRAFT_BENCH_ONLY=dedup_components SPARK_GRAFT_INITIAL_PARTITIONS=$ip \
    SPARK_GRAFT_ENVELOPE_SALTK=8 \
    java $JOPTS -Xmx96g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$CP" graft.Bench > /tmp/ab_comp_$ip.log 2>&1 || echo "JVM FAILED rc=$?"
  python3 -c "import json;d=json.load(open('target/bench.json'));print('  result', d['queries'], 'runs', d['runs'], 'warmup %.1f'%d['warmup_sec'], 'ok', d['ok'])" 2>/dev/null \
    || { echo "  no/failed bench.json:"; grep -E "no recent heartbeats|OutOfMemory|bench\]" /tmp/ab_comp_$ip.log | head -3; }
done
echo "AB DONE"
