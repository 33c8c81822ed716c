#!/bin/bash
# Round-15 measurement chain, part 2.
#
# The first run_mem12g.sh execution produced a NEW finding: at the
# 12 GB heap, sf10eq fails in BOTH configurations when the envelope is
# UNSALTED (saltK=1) — the control with the r14-captured storage-pool
# signature plus spill-ENOSPC, and the DISK_ONLY escape with a plain
# Java-heap OOM while one task serializes the single ~multi-GB
# order_detail partition into one block (GCLocker retry exhaustion,
# uncaught, JVM death). DISK_ONLY alone is NOT the whole escape: the
# envelope salt (GmallDwdDb scaladoc's "volume exceeds a task's
# comfortable working set" knob) is required too, exactly as the
# decade legs (which set SALTK=8) predicted. This script measures the
# missing half of the 2x2: both levels WITH the salt.
#
# Then: re-amplify sf100eq (deleted mid-round to save the DISK_ONLY
# leg from ENOSPC; AmplifyDecade is deterministic so the rebuild is
# bit-compatible with round 14's) and finish the fourth-decade leg.
set -e
cd /root/repo
CP="${GRAFT_CP:-target/scala-2.13/classes:target/scala-2.13/test-classes}:/opt/spark/jars/*"
JOPTS=$(grep -oE '"java.base/[a-z.]+"' build.sbt | tr -d '"' |
        sed 's/^/--add-opens /; s/$/=ALL-UNNAMED/' | tr '\n' ' ')
QUERIES="dwd_trade_order_detail,j1_inner_join_agg,j4_star_chain,text_token_ids,an_out_of_order,search_incremental_postings,text_chunk_pack,dedup_components_star,text_epoch_shuffle,text_mixture_sample,dedup_components,dws_trade_province_order_cdc_window,dedup_minhash_lsh,dws_trade_trademark_category_user_refund_cdc_window,ads_trademark_stats_cdc,search_bm25_topk,dws_trade_trademark_category_user_spu_order_cdc_window,dedup_triangles"
leg() { # tag extra-env...
  local tag="$1"; shift
  echo "=== 12g $tag sf10eq leg $(date -u +%H:%M:%S) ==="
  rm -f target/bench.json
  # shellcheck disable=SC2086
  env SPARK_GRAFT_SF_DIR=/tmp/sf10eq SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY="$QUERIES" "$@" \
    java $JOPTS -Xmx12g -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
      > "/tmp/mem12g_${tag}.full.log" 2>&1 || true
  cp target/bench.json "/tmp/mem12g_${tag}.json" 2>/dev/null || true
  python3 -c "
import json; d=json.load(open('/tmp/mem12g_${tag}.json'))
print('$tag ok:', d['ok'], 'failed:', len(d['errors']), 'total: %.1f s' % d['value'])
" || echo "$tag: no bench.json (JVM died before the report)"
}
leg diskonly_salt8 SPARK_GRAFT_MEMO_LEVEL=DISK_ONLY SPARK_GRAFT_ENVELOPE_SALTK=8
leg control_salt8 SPARK_GRAFT_ENVELOPE_SALTK=8

echo "=== re-amplify sf100eq $(date -u +%H:%M:%S) ==="
export SPARK_GRAFT_ENVELOPE_SALTK=8
# shellcheck disable=SC2086
java $JOPTS -Xmx96g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" \
  graft.AmplifyDecade /tmp/sf10eq /tmp/sf100eq > /tmp/amp_sf100eq_r15.log 2>&1

bash tools/run_decade4_finish.sh > /tmp/r15_decade4.log 2>&1
tail -30 /tmp/r15_decade4.log
echo "=== part-2 chain done $(date -u +%H:%M:%S) ==="
