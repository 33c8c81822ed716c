#!/bin/bash
# Round-15 completion of the fourth-decade leg: round 14 measured 2 of
# 11 sf100eq queries (an_out_of_order, text_token_ids) before its wall
# (/tmp/decade4_sf100eq_partial.json); this runs the remaining NINE on
# the same amplified dataset with the same per-query-JVM runner and
# merges the two artifacts into /tmp/decade4_sf100eq.json, then prints
# the full four-point exponent table. The two reused points are marked
# in the merged artifact; the envelope-family drop rationale is
# unchanged from run_decade4.sh's header.
set -e
cd /root/repo
export SPARK_GRAFT_ENVELOPE_SALTK=8
[ -d /tmp/sf100eq ] || { echo "amplified dataset missing: run tools/run_decade4.sh first"; exit 1; }

Q9="text_chunk_pack,search_incremental_postings,dedup_components_star,text_epoch_shuffle,text_mixture_sample,dedup_components,dedup_minhash_lsh,search_bm25_topk,dedup_triangles"
MEMODIR=/tmp/memo_sf100eq
rm -rf "$MEMODIR"
bash tools/run_leg_perq.sh /tmp/sf100eq /tmp/decade4_sf100eq_rest.json \
  "$Q9" 96g PARQUET "$MEMODIR"
echo "memo root after leg: $(du -sh "$MEMODIR" 2>/dev/null | cut -f1)"
rm -rf "$MEMODIR"

python3 - <<'PY'
import json
rest = json.load(open("/tmp/decade4_sf100eq_rest.json"))
part = json.load(open("/tmp/decade4_sf100eq_partial.json"))
for k in ("queries", "runs", "io"):
    merged = dict(part.get(k, {})); merged.update(rest.get(k, {}))
    rest[k] = merged
rest["value"] = sum(v for v in rest["queries"].values() if v >= 0)
rest["errors"] = part.get("errors", []) + rest.get("errors", [])
rest["ok"] = not rest["errors"]
rest["cpu_vs_wall_parts"] = part.get("cpu_vs_wall_parts", []) + rest.get("cpu_vs_wall_parts", [])
rest["cpu_vs_wall"] = min(rest["cpu_vs_wall_parts"])
rest["merged_from_partial"] = ["an_out_of_order", "text_token_ids"]
json.dump(rest, open("/tmp/decade4_sf100eq.json", "w"))
print("merged ->", "/tmp/decade4_sf100eq.json", "queries:", len(rest["queries"]),
      "ok:", rest["ok"], "total: %.1f s" % rest["value"])
PY

python3 tools/decade.py /tmp/decade4_sf0.1.json /tmp/decade4_sf1eq.json \
  /tmp/decade4_sf10eq.json /tmp/decade4_sf100eq.json \
  --labels sf0.1,sf1eq,sf10eq,sf100eq
echo "=== decade4 finish done $(date -u +%H:%M:%S) ==="
