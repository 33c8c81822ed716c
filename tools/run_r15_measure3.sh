#!/bin/bash
# Round-15 measurement chain, part 3.
#
# 1. The 12 GB memory finding, completed: the 2x2 (memo level x
#    envelope salt) all FAIL at the 12 GB heap — control and
#    DISK_ONLY, salted and not. The salted DISK_ONLY stack shows why
#    the level knob cannot save a block-store memo at small heap:
#    df.persist builds CACHED-COLUMNAR batches in executor heap
#    (CompressibleColumnBuilder.appendFrom -> dictionary stats) before
#    they ever reach disk, and 32 concurrent batch builders over the
#    envelope's wide map/string rows exceed 12 GB regardless of where
#    the finished blocks land. The escape that matches what a cluster
#    does is memo level PARQUET (r14): materialize once to columnar
#    FILES via bounded-row-group writers, re-read with pruning. This
#    leg proves it: same 18 queries, same 12 GB heap, one JVM,
#    SPARK_GRAFT_MEMO_LEVEL=PARQUET — expected clean; its per-query
#    times vs the 96 GB PARQUET decade-4 sf10eq leg are the IO premium.
# 2. Re-amplify sf100eq (deterministic rebuild) and finish the
#    fourth-decade leg (the nine unmeasured points).
set -e
cd /root/repo
CP="${GRAFT_CP:-target/scala-2.13/classes:target/scala-2.13/test-classes}:/opt/spark/jars/*"
JOPTS=$(grep -oE '"java.base/[a-z.]+"' build.sbt | tr -d '"' |
        sed 's/^/--add-opens /; s/$/=ALL-UNNAMED/' | tr '\n' ' ')
QUERIES="dwd_trade_order_detail,j1_inner_join_agg,j4_star_chain,text_token_ids,an_out_of_order,search_incremental_postings,text_chunk_pack,dedup_components_star,text_epoch_shuffle,text_mixture_sample,dedup_components,dws_trade_province_order_cdc_window,dedup_minhash_lsh,dws_trade_trademark_category_user_refund_cdc_window,ads_trademark_stats_cdc,search_bm25_topk,dws_trade_trademark_category_user_spu_order_cdc_window,dedup_triangles"

echo "=== 12g parquet_salt8 sf10eq leg $(date -u +%H:%M:%S) ==="
rm -f target/bench.json
rm -rf /tmp/memo_12g
# shellcheck disable=SC2086
env SPARK_GRAFT_SF_DIR=/tmp/sf10eq SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_MEMO_LEVEL=PARQUET SPARK_GRAFT_MEMO_DIR=/tmp/memo_12g \
  SPARK_GRAFT_ENVELOPE_SALTK=8 \
  java $JOPTS -Xmx12g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench \
    > /tmp/mem12g_parquet_salt8.full.log 2>&1 || true
cp target/bench.json /tmp/mem12g_parquet_salt8.json 2>/dev/null || true
python3 -c "
import json; d=json.load(open('/tmp/mem12g_parquet_salt8.json'))
print('parquet_salt8 ok:', d['ok'], 'failed:', len(d['errors']), 'total: %.1f s' % d['value'])
" || echo "parquet_salt8: no bench.json (JVM died before the report)"
echo "memo root: $(du -sh /tmp/memo_12g 2>/dev/null | cut -f1)"
rm -rf /tmp/memo_12g

echo "=== re-amplify sf100eq $(date -u +%H:%M:%S) ==="
export SPARK_GRAFT_ENVELOPE_SALTK=8
rm -rf /tmp/sf100eq
# shellcheck disable=SC2086
java $JOPTS -Xmx96g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" \
  graft.AmplifyDecade /tmp/sf10eq /tmp/sf100eq > /tmp/amp_sf100eq_r15.log 2>&1

bash tools/run_decade4_finish.sh > /tmp/r15_decade4.log 2>&1
tail -30 /tmp/r15_decade4.log
echo "=== part-3 chain done $(date -u +%H:%M:%S) ==="
