#!/bin/bash
# Fourth-decade measurement runner (round 14): amplifies up to
# sf100eq (~600 M lineitem / 150 M orders / 5 M documents / 100 M
# events, ~5.6 GB parquet) and runs the structure-sensitive set at
# sf0.1, sf1eq, sf10eq, sf100eq — four points, three decades, in one
# quiet-machine session.
#
# Every leg runs through tools/run_leg_perq.sh: one JVM per query,
# SPARK_GRAFT_MEMO_LEVEL=NONE, 96 GB heap. Why NONE: the flagship's
# CDC-envelope memo measures ~75 GB ON DISK at a mere sf10eq
# (SCALE.md round-14 measurements), so at sf100eq NO storage level
# fits this machine — the only honest configuration is recompute-
# from-parquet, which is also what a cluster does with a 100 TB raw
# envelope (nobody pins it). Why per-query JVMs: a leg-level JVM is
# lose-everything on one crash and its accumulated shuffle squats the
# disk the next query needs (measured: the 12 GB control's OOM-stopped
# context leaked its 57 GB block store, which starved the NEXT leg
# into ENOSPC). With NONE both bench runs recompute end-to-end, so
# repeat-min measures the full cold pipeline — a DIFFERENT attribution
# from the decade-3 warm-memo numbers; the four legs here share
# runner+config and are only comparable to each other.
#
# Query set: decade-3's 18 minus j4_star_chain (25+ min/leg at
# sf100eq; its e=0.78 is already twice-measured and j1 carries the
# join-scaling signal), ads_trademark_stats_cdc, and two of the three
# CDC commodity windows (kept: the province window as the family
# representative) — the dropped windows are envelope-recompute-
# dominated repeats of the kept one.
set -e
cd /root/repo
CP="${GRAFT_CP:-target/scala-2.13/classes:target/scala-2.13/test-classes}:/opt/spark/jars/*"
JOPTS=$(grep -oE '"java.base/[a-z.]+"' build.sbt | tr -d '"' |
        sed 's/^/--add-opens /; s/$/=ALL-UNNAMED/' | tr '\n' ' ')
amplify() { # src out
  [ -d "$2" ] && { echo "skip amplify: $2 exists"; return; }
  echo "=== amplify $1 -> $2 $(date -u +%H:%M:%S) ==="
  # shellcheck disable=SC2086
  java $JOPTS -Xmx96g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" \
    graft.AmplifyDecade "$1" "$2" > "/tmp/amp_$(basename "$2").log" 2>&1
}
amplify /root/testdata/sf0.1 /tmp/sf1eq
amplify /tmp/sf1eq /tmp/sf10eq
amplify /tmp/sf10eq /tmp/sf100eq

QUERIES="dwd_trade_order_detail,j1_inner_join_agg,text_token_ids,an_out_of_order,search_incremental_postings,text_chunk_pack,dedup_components_star,text_epoch_shuffle,text_mixture_sample,dedup_components,dws_trade_province_order_cdc_window,dedup_minhash_lsh,search_bm25_topk,dedup_triangles"
for leg in "sf0.1:/root/testdata/sf0.1" "sf1eq:/tmp/sf1eq" "sf10eq:/tmp/sf10eq" "sf100eq:/tmp/sf100eq"; do
  name="${leg%%:*}"; dir="${leg#*:}"
  echo "=== leg $name ($dir) $(date -u +%H:%M:%S) ==="
  bash tools/run_leg_perq.sh "$dir" "/tmp/decade4_${name}.json" \
    "$QUERIES" 96g NONE
done
echo "=== done $(date -u +%H:%M:%S) ==="
python3 tools/decade.py /tmp/decade4_sf0.1.json /tmp/decade4_sf1eq.json \
  /tmp/decade4_sf10eq.json /tmp/decade4_sf100eq.json \
  --labels sf0.1,sf1eq,sf10eq,sf100eq
