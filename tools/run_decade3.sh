#!/bin/bash
# Third-decade measurement runner (round 14): benches the structure-
# sensitive query set at sf0.1, sf1eq, sf10eq in one session (same
# JVM config, quiet machine) and emits one JSON per leg for
# tools/decade.py. All three legs re-run fresh so the comparison is
# same-session (the r13-era sf0.1/sf1eq numbers came from a different
# session and must not be mixed with a new leg).
set -e
cd /root/repo
QUERIES="dwd_trade_order_detail,j1_inner_join_agg,j4_star_chain,text_token_ids,an_out_of_order,search_incremental_postings,text_chunk_pack,dedup_components_star,text_epoch_shuffle,text_mixture_sample,dedup_components,dws_trade_province_order_cdc_window,dedup_minhash_lsh,dws_trade_trademark_category_user_refund_cdc_window,ads_trademark_stats_cdc,search_bm25_topk,dws_trade_trademark_category_user_spu_order_cdc_window,dedup_triangles"
# 96g heap on every leg (comparability): the memoized surface grows
# ~linearly with the data, and the sf10eq leg's 18 accumulated memos
# overflow the 12g default storage pool — on a real cluster this
# memory is the executor fleet's, not one JVM's.
for leg in "sf0.1:/root/testdata/sf0.1" "sf1eq:/tmp/sf1eq" "sf10eq:/tmp/sf10eq"; do
  name="${leg%%:*}"; dir="${leg#*:}"
  echo "=== leg $name ($dir) $(date -u +%H:%M:%S) ==="
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=96g \
    SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
    sbt "runMain graft.Bench" > "/tmp/decade_${name}.full.log" 2>&1 || true
  cp target/bench.json "/tmp/decade_${name}.json"
done
echo "=== done $(date -u +%H:%M:%S) ==="
python3 tools/decade.py /tmp/decade_sf0.1.json /tmp/decade_sf1eq.json /tmp/decade_sf10eq.json --labels sf0.1,sf1eq,sf10eq
