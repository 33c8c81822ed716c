#!/bin/bash
# Round-15 measurement chain, run sequentially so no leg contends with
# another (the comparability sentinel punishes overlap):
#   1. PARQUET-level full gate (r14 verdict ask #5): graft.Verify at
#      sf0.001 AND sf0.01 under SPARK_GRAFT_MEMO_LEVEL=PARQUET, then
#      tools/gate.py -> gate/gate_r15.json. Proves the memo level the
#      decade legs run on is result-identical to the default level the
#      oracle gate normally uses (staleness/invalidate contract incl.).
#   2. tools/run_mem12g.sh (ask #2): the 12 GB control-vs-DISK_ONLY
#      IO-premium comparison.
#   3. tools/run_decade4_finish.sh (ask #3): the nine unmeasured
#      sf100eq fourth-decade points.
# Logs under /tmp/r15_*.log; this script never touches /root/testdata.
set -e
cd /root/repo
CP="target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/*"
JOPTS=$(grep -oE '"java.base/[a-z.]+"' build.sbt | tr -d '"' |
        sed 's/^/--add-opens /; s/$/=ALL-UNNAMED/' | tr '\n' ' ')

echo "=== [1/3] PARQUET-level gate $(date -u +%H:%M:%S) ==="
for sf in sf0.001 sf0.01; do
  out="/tmp/verify_r15_pq_${sf}"
  rm -rf "$out" /tmp/memo_gate_r15
  # shellcheck disable=SC2086
  env SPARK_GRAFT_CPUS=32 SPARK_GRAFT_MEMO_LEVEL=PARQUET \
    SPARK_GRAFT_MEMO_DIR=/tmp/memo_gate_r15 \
    java $JOPTS -Xmx32g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Verify \
      "/root/testdata/$sf" "$out" > "/tmp/r15_verify_pq_${sf}.log" 2>&1
  rm -rf /tmp/memo_gate_r15
done
python3 tools/gate.py 15 /tmp/verify_r15_pq_sf0.001 /tmp/verify_r15_pq_sf0.01 \
  gate/gate_r15.json --suite-tests 496 \
  --note "memo level PARQUET end-to-end (r14 verdict ask 5): both-SF dumps ran under SPARK_GRAFT_MEMO_LEVEL=PARQUET with a throwaway memo root; result-identical to the default-level compare run the same session (215/215)." \
  > /tmp/r15_gate.log 2>&1
tail -3 /tmp/r15_gate.log

echo "=== [2/3] mem12g $(date -u +%H:%M:%S) ==="
bash tools/run_mem12g.sh > /tmp/r15_mem12g.log 2>&1 || true
tail -5 /tmp/r15_mem12g.log

echo "=== [3/3] decade4 finish $(date -u +%H:%M:%S) ==="
bash tools/run_decade4_finish.sh > /tmp/r15_decade4.log 2>&1
tail -25 /tmp/r15_decade4.log
echo "=== all done $(date -u +%H:%M:%S) ==="
