#!/bin/bash
# Fourth-decade measurement runner (round 14): amplifies up to
# sf100eq (~600 M lineitem / 5 M documents / 100 M events) and runs
# the structure-sensitive set at sf0.1, sf1eq, sf10eq, sf100eq in ONE
# session (same JVM config, quiet machine), one JSON per leg for
# tools/decade.py.
#
# Config difference vs run_decade3.sh, and why: at sf100eq the
# ACCUMULATED memo surface of the 18-query leg exceeds any single
# JVM's heap (the 12 GB OOM signature in SCALE.md is the same failure
# one decade earlier), so every leg here runs with
#   SPARK_GRAFT_MEMO_LEVEL=DISK_ONLY  (memo re-reads stream off disk,
#                                      never unroll into the heap) and
#   SPARK_GRAFT_BENCH_EVICT=1         (drop memos after each query —
#                                      surface = one query at a time).
# All four legs share the mode, so the exponents are internally
# comparable; they are NOT comparable to the in-memory decade-3
# numbers (the bench JSON records evict/memo_level for this reason).
# This is also the honest single-node configuration at this scale —
# a box that cannot hold the working set in memory must stream it.
#
# Runs are plain `java -cp` (no sbt lock): compile first with
# `sbt compile Test/compile`.
set -e
cd /root/repo
CP="target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/*"
JOPTS=$(grep -oE '"java.base/[a-z.]+"' build.sbt | tr -d '"' |
        sed 's/^/--add-opens /; s/$/=ALL-UNNAMED/' | tr '\n' ' ')
run_java() { # mem mainclass args...
  local mem="$1"; shift
  # shellcheck disable=SC2086
  java $JOPTS -Xmx"$mem" -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" "$@"
}
amplify() { # src out
  [ -d "$2" ] && { echo "skip amplify: $2 exists"; return; }
  echo "=== amplify $1 -> $2 $(date -u +%H:%M:%S) ==="
  run_java 96g graft.AmplifyDecade "$1" "$2"
}
amplify /root/testdata/sf0.1 /tmp/sf1eq
amplify /tmp/sf1eq /tmp/sf10eq
amplify /tmp/sf10eq /tmp/sf100eq

QUERIES="dwd_trade_order_detail,j1_inner_join_agg,j4_star_chain,text_token_ids,an_out_of_order,search_incremental_postings,text_chunk_pack,dedup_components_star,text_epoch_shuffle,text_mixture_sample,dedup_components,dws_trade_province_order_cdc_window,dedup_minhash_lsh,dws_trade_trademark_category_user_refund_cdc_window,ads_trademark_stats_cdc,search_bm25_topk,dws_trade_trademark_category_user_spu_order_cdc_window,dedup_triangles"
for leg in "sf0.1:/root/testdata/sf0.1" "sf1eq:/tmp/sf1eq" "sf10eq:/tmp/sf10eq" "sf100eq:/tmp/sf100eq"; do
  name="${leg%%:*}"; dir="${leg#*:}"
  echo "=== leg $name ($dir) $(date -u +%H:%M:%S) ==="
  rm -f target/bench.json # a dead JVM must not inherit the last leg's report
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_MEMO_LEVEL=DISK_ONLY SPARK_GRAFT_BENCH_EVICT=1 \
    SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    run_java 96g graft.Bench > "/tmp/decade4_${name}.full.log" 2>&1 || true
  cp target/bench.json "/tmp/decade4_${name}.json"
  df -h /tmp | tail -1
done
echo "=== done $(date -u +%H:%M:%S) ==="
python3 tools/decade.py /tmp/decade4_sf0.1.json /tmp/decade4_sf1eq.json \
  /tmp/decade4_sf10eq.json /tmp/decade4_sf100eq.json \
  --labels sf0.1,sf1eq,sf10eq,sf100eq
