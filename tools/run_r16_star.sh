#!/bin/bash
# Round-16 re-run of the star-contraction decade legs on the fixed
# pair-mining plan (fused size column + AQE initialPartitionNum):
# the four dedup queries at all four decade points, per-query JVMs,
# PARQUET memo level — directly comparable to the r15 decade artifacts.
set -e
cd /root/repo
export SPARK_GRAFT_ENVELOPE_SALTK=8
Q="dedup_components_star,dedup_components,dedup_minhash_lsh,dedup_triangles"
for leg in "/root/testdata/sf0.1 sf0.1 32g" "/tmp/sf1eq sf1eq 48g" "/tmp/sf10eq sf10eq 96g" "/tmp/sf100eq sf100eq 96g"; do
  set -- $leg
  MEMODIR=/tmp/memo_r16_$2
  rm -rf "$MEMODIR"
  bash tools/run_leg_perq.sh "$1" "/tmp/r16_star_$2.json" "$Q" "$3" PARQUET "$MEMODIR"
  echo "memo root after $2: $(du -sh "$MEMODIR" 2>/dev/null | cut -f1)"
  rm -rf "$MEMODIR"
done
python3 tools/decade.py /tmp/r16_star_sf0.1.json /tmp/r16_star_sf1eq.json \
  /tmp/r16_star_sf10eq.json /tmp/r16_star_sf100eq.json \
  --labels sf0.1,sf1eq,sf10eq,sf100eq
python3 tools/decade.py /tmp/r16_star_sf0.1.json /tmp/r16_star_sf1eq.json \
  /tmp/r16_star_sf10eq.json /tmp/r16_star_sf100eq.json \
  --labels sf0.1,sf1eq,sf10eq,sf100eq --field shuffle_write
echo "=== r16 star legs done $(date -u +%H:%M:%S) ==="
