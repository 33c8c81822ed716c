#!/bin/bash
# Round-17 re-run of the star-contraction decade legs, proving the r16
# pair-mining fix FROM HEAD with the measured-safe AQE shuffle config
# EXPLICITLY exported (r16 verdict task 1: the committed reproduction
# must exercise the configuration the sf100eq success was measured
# under, regardless of what GraftSession defaults to):
#   - initialPartitionNum=1024: decade-scale shuffles start wide and
#     AQE coalesces down (a fixed 32-way start ground multi-GB
#     sort/agg tasks into GC collapse at sf100eq — r15 SCALE.md)
#   - parallelismFirst=false + 32 MB advisory: coalesce by SIZE, not
#     toward 1 MB "parallelism" partitions (measured: the sf100eq
#     min-label leg dies of driver heartbeat starvation with it on)
# Four dedup queries at all four decade points, per-query JVMs,
# PARQUET memo level — directly comparable to the r15 decade artifacts.
# Writes /tmp/r17_star_<leg>.json; commit them under gate/.
set -e
cd /root/repo
export SPARK_GRAFT_ENVELOPE_SALTK=8
export SPARK_GRAFT_INITIAL_PARTITIONS=1024
export SPARK_GRAFT_PARALLELISM_FIRST=false
export SPARK_GRAFT_ADVISORY_PARTITION_BYTES=33554432
Q="dedup_components_star,dedup_components,dedup_minhash_lsh,dedup_triangles"
for leg in "/root/testdata/sf0.1 sf0.1 32g" "/tmp/sf1eq sf1eq 48g" "/tmp/sf10eq sf10eq 96g" "/tmp/sf100eq sf100eq 96g"; do
  set -- $leg
  MEMODIR=/tmp/memo_r17_$2
  rm -rf "$MEMODIR"
  bash tools/run_leg_perq.sh "$1" "/tmp/r17_star_$2.json" "$Q" "$3" PARQUET "$MEMODIR"
  echo "memo root after $2: $(du -sh "$MEMODIR" 2>/dev/null | cut -f1)"
  rm -rf "$MEMODIR"
done
python3 tools/decade.py /tmp/r17_star_sf0.1.json /tmp/r17_star_sf1eq.json \
  /tmp/r17_star_sf10eq.json /tmp/r17_star_sf100eq.json \
  --labels sf0.1,sf1eq,sf10eq,sf100eq
python3 tools/decade.py /tmp/r17_star_sf0.1.json /tmp/r17_star_sf1eq.json \
  /tmp/r17_star_sf10eq.json /tmp/r17_star_sf100eq.json \
  --labels sf0.1,sf1eq,sf10eq,sf100eq --field shuffle_write
echo "=== r17 star legs done $(date -u +%H:%M:%S) ==="
