#!/usr/bin/env python3
"""Pooled per-query oracle compare with timeouts — the sf>=0.1 form of
tools/local_verify.py.

Usage: python3 tools/shard_verify.py <sfDir> <verifyOutDir>
           [--pool N] [--timeout SECONDS] [query ...]

local_verify.py runs the whole catalog sequentially in one DuckDB
process; at sf0.1+ a handful of oracles are expensive enough that the
sequential pass takes hours, and a single runaway oracle (the labeled
quadratic baselines at sf1) would block everything behind it. This
driver runs each query as its own `local_verify.py <sf> <out> <name>`
subprocess, N at a time, with a per-query wall timeout. A timed-out
query is recorded TIMEOUT (and its process group killed), not FAIL —
the distinction matters: TIMEOUT on a labeled-quadratic ORACLE is an
oracle-cost statement, not an engine-correctness one.

Writes <verifyOutDir>_compare.json: {name: "PASS"|"FAIL"|"TIMEOUT"}
plus per-query wall seconds, and prints the FAIL/TIMEOUT names.
Exit 0 iff no FAIL (timeouts reported but don't fail the gate by
default — the caller decides what a timeout means for each query).
Pass --fail-on-timeout to make timeouts visible to exit-status-only
callers: any TIMEOUT then exits 2 (FAIL still wins with exit 1), so
a gate can distinguish a hung oracle from a wrong answer without
parsing the JSON (ADVICE r10).
"""
import json
import os
import shutil
import signal
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

HERE = os.path.dirname(os.path.abspath(__file__))


def run_one(sf_dir, out_dir, name, timeout):
    t0 = time.time()
    # each subprocess gets its OWN working directory: DuckDB spills to
    # cwd .tmp/duckdb_temp_storage*, and two spilling shards sharing a
    # cwd abort each other with IO "Could not remove file" (the r10
    # recipe ran shards from separate dirs by hand; this bakes it in)
    cwd = os.path.abspath(f"{out_dir}_cwd/{name}")
    # makedirs(exist_ok=True) reuses the dir across sweeps, so clear any
    # stale spill a previous SIGKILLed run left behind before starting
    shutil.rmtree(cwd, ignore_errors=True)
    os.makedirs(cwd, exist_ok=True)
    p = subprocess.Popen(
        [sys.executable, os.path.join(HERE, "local_verify.py"),
         os.path.abspath(sf_dir), os.path.abspath(out_dir), name],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=True, text=True, cwd=cwd)
    try:
        out, _ = p.communicate(timeout=timeout)
        status = "PASS" if (p.returncode == 0 and f"PASS {name}" in out) \
            else "FAIL"
        detail = out.strip().splitlines()[-3:]
    except subprocess.TimeoutExpired:
        os.killpg(os.getpgid(p.pid), signal.SIGKILL)
        p.wait()
        status, detail = "TIMEOUT", []
    # ADVICE r11: the heavy oracles spill >60GB each into cwd
    # (.tmp/duckdb_temp_storage*); a SIGKILLed timeout leaves it all
    # behind, and repeated sweeps would accumulate enough stale spill to
    # exhaust disk. The subprocess (and its whole process group) is dead
    # on both paths here, so the dir is removable.
    shutil.rmtree(cwd, ignore_errors=True)
    return name, status, round(time.time() - t0, 1), detail


def main():
    args = [a for a in sys.argv[1:]]
    pool, timeout = 8, 2700
    fail_on_timeout = False
    if "--fail-on-timeout" in args:
        fail_on_timeout = True
        args.remove("--fail-on-timeout")
    if "--pool" in args:
        i = args.index("--pool"); pool = int(args[i + 1]); del args[i:i + 2]
    if "--timeout" in args:
        i = args.index("--timeout"); timeout = int(args[i + 1]); del args[i:i + 2]
    sf_dir, out_dir = args[0], args[1]
    only = args[2:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(only if only else oracle.keys())
    results = {}
    with ThreadPoolExecutor(max_workers=pool) as ex:
        futs = [ex.submit(run_one, sf_dir, out_dir, n, timeout) for n in names]
        for f in futs:
            name, status, secs, detail = f.result()
            results[name] = {"status": status, "sec": secs}
            line = f"{status} {name} ({secs}s)"
            if status == "FAIL":
                line += " :: " + " | ".join(detail)
            print(line, flush=True)
    with open(f"{out_dir}_compare.json", "w") as fh:
        json.dump(results, fh, indent=1, sort_keys=True)
    n_pass = sum(1 for r in results.values() if r["status"] == "PASS")
    n_fail = sum(1 for r in results.values() if r["status"] == "FAIL")
    n_to = sum(1 for r in results.values() if r["status"] == "TIMEOUT")
    print(f"{n_pass} pass, {n_fail} fail, {n_to} timeout / {len(results)}")
    sys.exit(1 if n_fail else (2 if (fail_on_timeout and n_to) else 0))


if __name__ == "__main__":
    main()
