#!/bin/bash
# Fix-proof for SCALE.md's memory finding (round 14): the sf10eq
# 18-query leg that FAIL-HARD OOMs at the 12 GB default heap under
# MEMORY_AND_DISK memos (storage-pool unroll of spilled blocks, 32
# concurrent tasks — full signature in SCALE.md) is re-run in the SAME
# 12 GB heap with the one-conf escape hatch
# SPARK_GRAFT_MEMO_LEVEL=DISK_ONLY. Memo re-reads then stream off disk
# and never unroll into the storage pool. Leg identical otherwise
# (same queries, accumulated memos, no evict). Expected: clean run;
# cost = the IO premium vs the 96 GB in-memory numbers, recorded in
# SCALE.md. Compile first (`sbt compile Test/compile`); runs plain
# java so it doesn't take the sbt lock.
set -e
cd /root/repo
CP="${GRAFT_CP:-target/scala-2.13/classes:target/scala-2.13/test-classes}:/opt/spark/jars/*"
JOPTS=$(grep -oE '"java.base/[a-z.]+"' build.sbt | tr -d '"' |
        sed 's/^/--add-opens /; s/$/=ALL-UNNAMED/' | tr '\n' ' ')
QUERIES="dwd_trade_order_detail,j1_inner_join_agg,j4_star_chain,text_token_ids,an_out_of_order,search_incremental_postings,text_chunk_pack,dedup_components_star,text_epoch_shuffle,text_mixture_sample,dedup_components,dws_trade_province_order_cdc_window,dedup_minhash_lsh,dws_trade_trademark_category_user_refund_cdc_window,ads_trademark_stats_cdc,search_bm25_topk,dws_trade_trademark_category_user_spu_order_cdc_window,dedup_triangles"
leg() { # tag extra-env...
  local tag="$1"; shift
  echo "=== 12g $tag sf10eq leg $(date -u +%H:%M:%S) ==="
  rm -f target/bench.json # a dead JVM must not inherit the last leg's report
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
# A: the failure configuration (default MEMORY_AND_DISK memos) —
#    expected to OOM exactly as SCALE.md's captured signature
leg control
# B: same heap, same leg, the one-conf escape hatch — expected clean
leg diskonly SPARK_GRAFT_MEMO_LEVEL=DISK_ONLY
echo "=== done $(date -u +%H:%M:%S) ==="
