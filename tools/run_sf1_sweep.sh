#!/bin/bash
# Full oracle sweep at an sf1-scale dir, per the proven r10 recipe
# (.claude/skills/verify/SKILL.md): cheap oracles pooled with bounded
# DuckDB resources, then the heavy list sequential with a large limit,
# then one sequential retry of anything that failed. Two distinct
# cheap-pool failure modes motivate the retry (r11, organic sf1):
# DuckDB aborts racing on a shared cwd temp dir (fixed in shard_verify
# — per-query cwd — but belt+braces), and internal errors under a
# tight memory_limit on spilling aggregations (q136 threw an
# INT64-overflow from INSIDE DuckDB at 6GB; same query, same data,
# 30GB: clean pass, 4695 rows). A query that fails twice — pooled AND
# sequential-at-80GB — is a real mismatch.
#
# Exit status (ADVICE r11 + VERDICT r11 item 5): 0 only when the final
# accumulated compare is all-PASS; 1 when any FAIL remains after the
# retry (a real mismatch); 2 when only TIMEOUTs remain (an oracle-cost
# statement, not an engine-correctness one — but visible, so a gate
# keying off the exit code cannot read a hung oracle as green). The
# per-pass shard_verify calls run with --fail-on-timeout for the same
# reason; their codes steer the retry (timeouts and fails both re-run
# sequentially at 80GB — the bigger-memory re-run IS the remedy for
# both known infra modes). A crashed pass (no _compare.json) exits 3
# instead of silently accumulating stale state.
# Usage: tools/run_sf1_sweep.sh <sfDir> <verifyOutDir>
set -u
SF=$1; OUT=$2
HEAVY="q20_cosine_topk q16_ngram_jaccard q87_ann_recall_audit q67_neardup_clusters \
q91_clusters_altcc q133_dedup_by_source q134_cluster_histogram q147_split_leakage \
q196_cluster_separation q126_corpus_clean q105_semantic_dedup q194_mrr_eval \
q17_minhash_signatures q73_minhash_estimate q100_adc_search q94_span_dedup \
q101_pq_recall q177_rag_context q39_ann_multiprobe"
ALL=$(python3 -c "import json;print(' '.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")
CHEAP=""
for q in $ALL; do
  case " $HEAVY " in *" $q "*) ;; *) CHEAP="$CHEAP $q";; esac
done

# shard_verify overwrites <out>_compare.json per invocation; fold each
# pass into the accumulator at <out>_compare_all.json. A pass that
# crashed before writing its compare file must abort the sweep — the
# accumulator would otherwise carry the PREVIOUS pass's state forward
# and the summary would lie about coverage.
accumulate() {
  python3 - "$OUT" <<'PY' || exit 3
import json, sys, os
out = sys.argv[1]
if not os.path.exists(out + "_compare.json"):
    sys.exit(f"accumulate: {out}_compare.json missing - pass crashed?")
acc = {}
if os.path.exists(out + "_compare_all.json"):
    acc = json.load(open(out + "_compare_all.json"))
acc.update(json.load(open(out + "_compare.json")))
json.dump(acc, open(out + "_compare_all.json", "w"), indent=1, sort_keys=True)
PY
}

rm -f "${OUT}_compare_all.json"
echo "== cheap pool ($(echo $CHEAP | wc -w)) =="
DUCKDB_THREADS=4 DUCKDB_MEMORY=6GB python3 tools/shard_verify.py "$SF" "$OUT" \
  --pool 8 --timeout 2700 --fail-on-timeout $CHEAP
echo "(cheap pool rc=$? — 1: fails, 2: timeouts; both retried below)"
accumulate
echo "== heavy sequential ($(echo $HEAVY | wc -w)) =="
DUCKDB_THREADS=28 DUCKDB_MEMORY=80GB python3 tools/shard_verify.py "$SF" "$OUT" \
  --pool 1 --timeout 5400 --fail-on-timeout $HEAVY
echo "(heavy pass rc=$?)"
accumulate

RETRY=$(python3 -c "
import json
d = json.load(open('${OUT}_compare_all.json'))
print(' '.join(sorted(n for n, r in d.items() if r['status'] != 'PASS')))")
if [ -n "$RETRY" ]; then
  echo "== retry ($(echo $RETRY | wc -w)) =="
  DUCKDB_THREADS=28 DUCKDB_MEMORY=80GB python3 tools/shard_verify.py "$SF" "$OUT" \
    --pool 1 --timeout 5400 --fail-on-timeout $RETRY
  echo "(retry rc=$?)"
  accumulate
fi

cp "${OUT}_compare_all.json" "${OUT}_compare.json"
# Final summary decides the sweep's exit code from the accumulated
# state, not the per-pass codes (a first-pass FAIL that retried green
# is a PASS; a retried FAIL is a real mismatch).
python3 - "$OUT" <<'PY'
import json, sys
d = json.load(open(sys.argv[1] + "_compare.json"))
from collections import Counter
c = Counter(r["status"] for r in d.values())
print("final:", dict(c), "/", len(d))
if c.get("FAIL", 0) or c.get("TIMEOUT", 0):
    bad = sorted(n for n, r in d.items() if r["status"] != "PASS")
    print("NON-PASS after retry:", " ".join(bad))
sys.exit(1 if c.get("FAIL", 0) else (2 if c.get("TIMEOUT", 0) else 0))
PY
