#!/bin/bash
# Round-17 promotion measurement for the Memo heap guard's `auto` mode
# (r16 verdict task 6): the same sf10eq 18-query envelope-heavy leg
# that block-store persist FAIL-HARD OOMs in a 12 GB heap (SCALE.md
# "12 GB memory finding", 2x2 measured) runs with NO explicit memo
# level and spark.graft.memo.heapGuard=auto — the guard must detect
# heap/task < 512 MB and switch the implicit default to PARQUET,
# producing a clean 18/18 leg. If it does, `auto` becomes the shipped
# default (an explicitly configured level is always honored, so
# measurement tooling that pins DISK_ONLY still measures DISK_ONLY).
set -e
cd /root/repo
CP="${GRAFT_CP:-target/scala-2.13/classes:target/scala-2.13/test-classes}:/opt/spark/jars/*"
JOPTS=$(grep -oE '"java.base/[a-z.]+"' build.sbt | tr -d '"' |
        sed 's/^/--add-opens /; s/$/=ALL-UNNAMED/' | tr '\n' ' ')
QUERIES="dwd_trade_order_detail,j1_inner_join_agg,j4_star_chain,text_token_ids,an_out_of_order,search_incremental_postings,text_chunk_pack,dedup_components_star,text_epoch_shuffle,text_mixture_sample,dedup_components,dws_trade_province_order_cdc_window,dedup_minhash_lsh,dws_trade_trademark_category_user_refund_cdc_window,ads_trademark_stats_cdc,search_bm25_topk,dws_trade_trademark_category_user_spu_order_cdc_window,dedup_triangles"
MEMODIR=/tmp/memo_12g_auto
rm -rf "$MEMODIR"
rm -f target/bench.json
# shellcheck disable=SC2086
env SPARK_GRAFT_SF_DIR=/tmp/sf10eq SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ENVELOPE_SALTK=8 SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_MEMO_DIR="$MEMODIR" \
  java $JOPTS -Xmx12g -Dspark.ui.enabled=false \
    -Dspark.graft.memo.heapGuard=auto \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
    > /tmp/mem12g_auto.full.log 2>&1 || true
cp target/bench.json /tmp/mem12g_auto.json 2>/dev/null || {
  echo "mem12g_auto: no bench.json (JVM died before the report)"; exit 1; }
grep -m1 "Memo heap guard" /tmp/mem12g_auto.full.log || \
  echo "WARNING: guard warning line not found in log"
python3 -c "
import json; d=json.load(open('/tmp/mem12g_auto.json'))
print('mem12g_auto ok:', d['ok'], 'failed:', len(d['errors']),
      'total: %.1f s' % d['value'], 'memo_level:', d['memo_level'])"
rm -rf "$MEMODIR"
