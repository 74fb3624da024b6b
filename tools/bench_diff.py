#!/usr/bin/env python3
"""Per-query bench regression diff (VERDICT r05 item 7; default gate r09).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--threshold 0.15]
(argparse: options may appear anywhere; both --threshold 0.15 and
--threshold=0.15 forms work)

The canonical regression gate is diffing against the committed baseline:

    python3 tools/bench_diff.py BASELINE_BENCH.json BENCH_LOCAL.json

Reads two BENCH_LOCAL.json-format files (the full-map artifact graft.Bench
writes), joins their per-query medians, and flags queries whose time moved
more than the threshold in either direction. Prints a summary + the flagged
table; exits 1 if any query regressed past the threshold (so the round
workflow can notice), 0 otherwise.

CALIB NORMALIZATION IS THE DEFAULT (r07 verdict item 1): when both files
carry calib_sec, the NEW run is rescaled by old_calib/new_calib before
diffing, so host/boot drift is separated from code effects and the gate
flags only code-attributable moves. Pass --no-calib-normalize to compare
raw wall-clock instead. If either file lacks the anchor, or the two
anchors disagree anisotropically (>1.5x apart), normalization is skipped
with a loud note and the diff proceeds RAW — a single rescale would
manufacture fake moves in those cases.

Round-5 motivation: shared queries inflated 30-80% between the 87-query
r04 run and the 190-query r05 run with unchanged plans, and nothing in the
repo caught it. This closes that blind spot.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip())
    return d


def main():
    p = argparse.ArgumentParser(
        description="Per-query bench regression diff")
    p.add_argument("old", help="previous BENCH_LOCAL.json")
    p.add_argument("new", help="current BENCH_LOCAL.json")
    p.add_argument("--threshold", type=float, default=0.15,
                   help="relative move to flag (default 0.15)")
    p.add_argument("--no-calib-normalize", action="store_true",
                   help="compare raw wall-clock instead of rescaling the "
                        "NEW run by old_calib/new_calib (normalization is "
                        "the default when both files carry calib_sec — the "
                        "fixed CPU-anchor graft.Bench times each rep round; "
                        "it separates host/boot drift from code effects)")
    # accepted for backward compatibility; normalization is now the default
    p.add_argument("--calib-normalize", action="store_true",
                   help=argparse.SUPPRESS)
    ns = p.parse_args()
    thr = ns.threshold
    old, new = load(ns.old), load(ns.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    oc, nc = old.get("calib_sec"), new.get("calib_sec")
    oc2, nc2 = old.get("calib2_sec"), new.get("calib2_sec")
    if oc and nc:
        print(f"calibration anchor (arith): old {oc:.3f}s, new {nc:.3f}s "
              f"(host ratio {nc / oc:.2f}x)")
    if oc2 and nc2:
        print(f"calibration anchor (string-md5): old {oc2:.3f}s, "
              f"new {nc2:.3f}s (host ratio {nc2 / oc2:.2f}x)")
    if (oc2 is None) != (nc2 is None):
        print("note: only one run carries the string-md5 anchor "
              "(calib2_sec added r07) — anisotropic-drift detection "
              "unavailable; treat any single-ratio normalization with "
              "suspicion across boots")
    anisotropic = (oc and nc and oc2 and nc2 and
                   max((nc / oc) / (nc2 / oc2), (nc2 / oc2) / (nc / oc)) > 1.5)
    if anisotropic:
        print("WARNING: the two anchors moved differently (>1.5x apart) — "
              "ANISOTROPIC host drift (e.g. SMT/topology change: light "
              "work faster, throughput work slower). Single-ratio "
              "normalization is ill-defined; trust only within-boot A/B "
              "(BenchOne, same harness, per-rep minimum).")
    if ns.no_calib_normalize:
        print("calib normalization disabled (--no-calib-normalize): "
              "diffing raw wall-clock")
    elif not (oc and nc):
        print("note: calib_sec missing from one or both files — "
              "normalization unavailable, diffing raw wall-clock")
    elif anisotropic:
        print("note: skipping calib normalization (anchors disagree, see "
              "WARNING above; a single rescale would manufacture fake "
              "moves) — diffing raw wall-clock")
    else:
        scale = oc / nc
        nq = {k: v * scale for k, v in nq.items()}
        print(f"new-run times rescaled by {scale:.3f} "
              f"(calib normalization, host drift ratio {nc / oc:.3f}x; "
              f"pass --no-calib-normalize for raw)")
    shared = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    errored = sorted(set(old.get("errors", {})) | set(new.get("errors", {})))

    regressed, improved = [], []
    for q in shared:
        a, b = oq[q], nq[q]
        if a <= 0:
            continue
        delta = (b - a) / a
        if delta > thr:
            regressed.append((q, a, b, delta))
        elif delta < -thr:
            improved.append((q, a, b, delta))

    tot_old = sum(oq[q] for q in shared)
    tot_new = sum(nq[q] for q in shared)
    print(f"shared queries: {len(shared)}  "
          f"(old-only {len(only_old)}, new-only {len(only_new)})")
    if not shared:
        sys.exit("no shared queries — are these full-map BENCH_LOCAL.json "
                 "files (the driver's BENCH_rNN.json keeps only a tail)?")
    print(f"shared-subset total: {tot_old:.1f}s -> {tot_new:.1f}s  "
          f"({(tot_new - tot_old) / tot_old * 100:+.1f}%)")
    if errored:
        print(f"errored in either run (excluded by Bench): {', '.join(errored)}")

    def table(title, rows):
        if not rows:
            return
        print(f"\n{title} (>{thr:.0%}):")
        for q, a, b, d in sorted(rows, key=lambda r: -abs(r[3])):
            print(f"  {q:40s} {a:7.2f}s -> {b:7.2f}s  {d * 100:+6.1f}%")

    table("REGRESSED", regressed)
    table("improved", improved)
    if not regressed and not improved:
        print(f"no per-query move beyond {thr:.0%}")
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
