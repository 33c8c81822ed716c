#!/bin/bash
# Fourth-decade measurement runner (round 14): amplifies up to
# sf100eq (~600 M lineitem / 150 M orders / 5 M documents / 100 M
# events, ~5.9 GB parquet) and runs the structure-sensitive set at
# sf0.1, sf1eq, sf10eq, sf100eq — four points, three decades, in one
# quiet-machine session.
#
# Every leg runs through tools/run_leg_perq.sh: one JVM per query,
# SPARK_GRAFT_MEMO_LEVEL=PARQUET with a per-leg memo root, 96 GB heap.
#
# Why PARQUET (not DISK_ONLY, not NONE): the flagship's CDC-envelope
# memo is ~75 GB as a DISK_ONLY block store at a mere sf10eq — no
# persist level fits sf100eq on this machine — and the first NONE
# attempt was killed after the FIRST sf0.1 query burned 4 CPU-hours
# (a query referencing the envelope N times re-derives AND re-parses
# it N times per action; no deployment pays that). The reference
# itself materializes DWD once into Kafka topics and every consumer
# re-reads the topic (MyKafkaUtil.java:24-56); Memo level PARQUET is
# exactly that shape: first toucher materializes compressed columnar
# (~30x smaller than the block store), every later query — across
# per-query JVMs, like consumers across processes — scans it with
# row-group pruning. repeat-min therefore measures the steady-state
# read-from-materialized-DWD path, the same attribution at all four
# legs and the one a cluster actually runs.
#
# Why per-query JVMs: a leg-level JVM is lose-everything on one crash
# and its accumulated shuffle squats the disk the next query needs
# (measured: the 12 GB control's OOM-stopped context leaked its 57 GB
# block store, which starved the NEXT leg into ENOSPC). The memo
# parquet root survives across the leg's JVMs (that is the point);
# it is deleted after each leg to return the disk.
#
# Query set: decade-3's 18 minus j4_star_chain (25+ min/leg at
# sf100eq; its e=0.78 is already twice-measured and j1 carries the
# join-scaling signal), ads_trademark_stats_cdc, and two of the three
# CDC commodity windows (kept: the province window as the family
# representative) — the dropped windows are envelope-recompute-
# dominated repeats of the kept one.
set -e
cd /root/repo
# Spread the dominant envelope table (order_detail) across 8 tasks per
# leg — past sf10eq its single partition is the measured build wall
# (GmallDwdDb.envelope scaladoc); inherited by every leg JVM.
export SPARK_GRAFT_ENVELOPE_SALTK=8
amplify() { # src out
  [ -d "$2" ] && { echo "skip amplify: $2 exists"; return; }
  echo "=== amplify $1 -> $2 $(date -u +%H:%M:%S) ==="
  CP="${GRAFT_CP:-target/scala-2.13/classes:target/scala-2.13/test-classes}:/opt/spark/jars/*"
  JOPTS=$(grep -oE '"java.base/[a-z.]+"' build.sbt | tr -d '"' |
          sed 's/^/--add-opens /; s/$/=ALL-UNNAMED/' | tr '\n' ' ')
  # shellcheck disable=SC2086
  java $JOPTS -Xmx96g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" \
    graft.AmplifyDecade "$1" "$2" > "/tmp/amp_$(basename "$2").log" 2>&1
}
amplify /root/testdata/sf0.1 /tmp/sf1eq
amplify /tmp/sf1eq /tmp/sf10eq
amplify /tmp/sf10eq /tmp/sf100eq

QUERIES="dwd_trade_order_detail,j1_inner_join_agg,text_token_ids,an_out_of_order,search_incremental_postings,text_chunk_pack,dedup_components_star,text_epoch_shuffle,text_mixture_sample,dedup_components,dws_trade_province_order_cdc_window,dedup_minhash_lsh,search_bm25_topk,dedup_triangles"
# sf100eq drops the three CDC-envelope queries — NOT because the query
# plans can't scale (their per-action io/time is measured to sf10eq in
# THIS session), but because the envelope FIXTURE DERIVATION (synthesize
# 26 JSON slices from 600 M lineitem and parse them back) is leg-prep
# synthesis cost ~10x the whole rest of the leg at this machine's disk
# throughput. The drop is a measurement-budget cap, stated here and in
# SCALE.md; the envelope family's exponents come from the three
# same-session points below.
Q100="text_token_ids,an_out_of_order,search_incremental_postings,text_chunk_pack,dedup_components_star,text_epoch_shuffle,text_mixture_sample,dedup_components,dedup_minhash_lsh,search_bm25_topk,dedup_triangles"
for leg in "sf0.1:/root/testdata/sf0.1" "sf1eq:/tmp/sf1eq" "sf10eq:/tmp/sf10eq" "sf100eq:/tmp/sf100eq"; do
  name="${leg%%:*}"; dir="${leg#*:}"
  qs="$QUERIES"; [ "$name" = sf100eq ] && {
    qs="$Q100"
    echo "sf100eq: DROPPED dwd_trade_order_detail,j1_inner_join_agg,dws_trade_province_order_cdc_window (envelope synthesis = leg-prep cost; see header)"
  }
  echo "=== leg $name ($dir) $(date -u +%H:%M:%S) ==="
  MEMODIR="/tmp/memo_${name}"
  rm -rf "$MEMODIR"
  bash tools/run_leg_perq.sh "$dir" "/tmp/decade4_${name}.json" \
    "$qs" 96g PARQUET "$MEMODIR"
  echo "memo root after leg: $(du -sh "$MEMODIR" 2>/dev/null | cut -f1)"
  rm -rf "$MEMODIR"
done
echo "=== done $(date -u +%H:%M:%S) ==="
python3 tools/decade.py /tmp/decade4_sf0.1.json /tmp/decade4_sf1eq.json \
  /tmp/decade4_sf10eq.json /tmp/decade4_sf100eq.json \
  --labels sf0.1,sf1eq,sf10eq,sf100eq
