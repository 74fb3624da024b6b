#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the parquet
tables in <sfDir>, and compares: row count, column names, and exact values
(bitwise for doubles) after sorting columns by name and rows by all
columns.
"""
import json
import math
import os
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, ncols):
    def key(row):
        return tuple(
            (v is None, str(type(v)), repr(v)) for v in row
        )
    return sorted(rows, key=key)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Sharded sf0.1/sf1 sweeps run many of these processes concurrently;
    # unbounded each one claims every core and 80% of RAM, and two
    # spilling shards sharing a cwd race on .tmp/duckdb_temp_storage
    # (observed: IO "Could not remove file" aborts). Callers bound each
    # shard and give it its own working directory.
    threads = os.environ.get("DUCKDB_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    mem = os.environ.get("DUCKDB_MEMORY")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in spark_cols) +
                f" FROM '{out_dir}/{name}/*.parquet'").fetchall()
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = con.sql(
                "SELECT " + ", ".join(f'"{c}"' for c in duck_cols) +
                f" FROM ({sql}) oracle_q").fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {str(e)[:200]}")
            n_fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: cols spark={spark_cols} duck={duck_cols}")
            n_fail += 1
            continue
        # arrow-type comparison: catches silent promotions (e.g. DuckDB
        # SUM(BIGINT) -> HUGEINT) a value-only compare would miss
        sa = con.sql("SELECT " + ", ".join(f'"{c}"' for c in spark_cols) +
                     f" FROM '{out_dir}/{name}/*.parquet'").arrow().schema
        da = con.sql("SELECT " + ", ".join(f'"{c}"' for c in duck_cols) +
                     f" FROM ({sql}) oracle_q").arrow().schema
        tdiff = [f"{c}: spark={ta} duck={tb}"
                 for c, ta, tb in zip(spark_cols, sa.types, da.types)
                 if str(ta) != str(tb)]
        if tdiff:
            print(f"WARN {name}: type drift {'; '.join(tdiff[:4])}")
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} duck={len(duck_rows)}")
            n_fail += 1
            continue
        a = canon(spark_rows, len(spark_cols))
        b = canon(duck_rows, len(duck_cols))
        bad = None
        for i, (ra, rb) in enumerate(zip(a, b)):
            if ra != rb:
                # float bitwise check with readable diff
                diffs = []
                for c, (x, y) in zip(spark_cols, zip(ra, rb)):
                    if x != y or (isinstance(x, float) and isinstance(y, float)
                                  and not (math.isnan(x) and math.isnan(y))
                                  and x != y):
                        diffs.append(f"{c}: spark={x!r} duck={y!r}")
                if diffs:
                    bad = (i, diffs)
                    break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}: {'; '.join(bad[1][:4])}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
