#!/bin/bash
# Full oracle sweep at an sf1-scale dir, per the proven r10 recipe
# (.claude/skills/verify/SKILL.md): cheap oracles pooled with bounded
# DuckDB resources, then the heavy list sequential with a large limit.
# Usage: tools/run_sf1_sweep.sh <sfDir> <verifyOutDir>
set -u
SF=$1; OUT=$2
HEAVY="q20_brute_topk q16_ngram_jaccard q87_ann_recall_audit q67_neardup_clusters \
q91_dedup_audit q133_dedup_by_source q134_stratified_sample q147_blocked_pairs \
q196_cluster_separation q126_self_bleu q105_semantic_dedup q194_mrr_eval \
q17_minhash_signatures q73_embedding_recall q100_adc_search q94_span_dedup \
q101_pq_recall q177_cosine_topk_audit q39_lsh_multiprobe"
ALL=$(python3 -c "import json;print(' '.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")
CHEAP=""
for q in $ALL; do
  case " $HEAVY " in *" $q "*) ;; *) CHEAP="$CHEAP $q";; esac
done
echo "== cheap pool ($(echo $CHEAP | wc -w)) =="
DUCKDB_THREADS=4 DUCKDB_MEMORY=6GB python3 tools/shard_verify.py "$SF" "$OUT" --pool 8 --timeout 2700 $CHEAP
cp "${OUT}_compare.json" "${OUT}_compare_cheap.json"
echo "== heavy sequential ($(echo $HEAVY | wc -w)) =="
DUCKDB_THREADS=28 DUCKDB_MEMORY=80GB python3 tools/shard_verify.py "$SF" "$OUT" --pool 1 --timeout 5400 $HEAVY
# shard_verify overwrites <out>_compare.json per invocation - merge the
# cheap and heavy passes into one table
python3 - "$OUT" <<'PY'
import json, sys, os
out = sys.argv[1]
merged = {}
for suffix in ["_compare_cheap.json", "_compare.json"]:
    p = out + suffix
    if os.path.exists(p):
        merged.update(json.load(open(p)))
json.dump(merged, open(out + "_compare.json", "w"), indent=1, sort_keys=True)
n = sum(1 for r in merged.values() if r["status"] == "PASS")
print(f"merged: {n} pass / {len(merged)}")
PY
