#!/usr/bin/env python3
"""Derive an sf1-scale dataset from the driver's sf0.1 fixtures
(VERDICT r07 item 7 — the sf0.1→sf1 scaling probe needs a real 10×
datapoint and the driver only ships sf≤0.1).

Usage: python3 tools/make_sf1.py [outDir]   (default tmp/sf1)

10× deterministic replication, NOT new synthesis — replica k offsets
every entity key by k·(max+1) so keys stay unique and joins stay
consistent, and perturbs payload text per replica so each replica has
the ORIGINAL's internal duplicate/near-duplicate structure instead of
becoming a 10-way exact-dup corpus:

  documents   doc_id offset; replica k>0 prefixes "r<k> " to text
              (n_chars recomputed) — within-replica dup structure
              preserved, cross-replica collisions broken
  embeddings  vec_id offset; replica k>0 nudges dimension (k mod dim)
              by k·1e-3 — breaks exact ties, keeps neighborhoods
  events      event_id/user_id offsets — 10× the users, each with the
              original per-user history (the per-user window/PIT shape
              scales in users, not in history depth)
  lineitem/orders/customer  fact keys offset (orderkey/custkey join
              consistency maintained); c_name is REGENERATED from the
              offset key ('Customer#%09d' — the source format), because
              a name that embeds the old key would leave key-derived
              blocking/fingerprint columns identical across replicas
              and quadratically inflate block joins (first observed on
              q114: last-3-chars blocks went 10× deep, 95× wall-clock);
              part/supplier/nation/region are DIMENSIONS — copied
              unscaled, exactly how a 10× fact load meets the same
              dimension tables


DuckDB-side tool (driver-side python, like local_verify.py); writes
snappy parquet that graft.Tables.load reads unchanged. Deterministic:
no randomness anywhere, same input → same bytes modulo parquet
metadata.
"""
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "tmp/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")

    def src(t):
        return f"read_parquet('{SRC}/{t}.parquet')"

    def write(t, sql):
        con.execute(
            f"COPY ({sql}) TO '{out}/{t}.parquet' "
            f"(FORMAT parquet, COMPRESSION snappy)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"  {t}: {n} rows")

    def replicate(t, sql_for_k):
        return " UNION ALL ".join(sql_for_k(k) for k in range(REPLICAS))

    print(f"deriving sf1 from {SRC} -> {out} ({REPLICAS}x)")

    max_doc = con.execute(f"SELECT max(doc_id)+1 FROM {src('documents')}").fetchone()[0]
    write("documents", replicate("documents", lambda k: f"""
        SELECT doc_id + {k * max_doc} AS doc_id,
               {f"'r{k} ' || text" if k else "text"} AS text,
               lang, source,
               {f"n_chars + {len(f'r{k} ')}" if k else "n_chars"} AS n_chars
        FROM {src('documents')}"""))

    max_vec = con.execute(f"SELECT max(vec_id)+1 FROM {src('embeddings')}").fetchone()[0]
    dim = con.execute(f"SELECT len(embedding) FROM {src('embeddings')} LIMIT 1").fetchone()[0]
    write("embeddings", replicate("embeddings", lambda k: f"""
        SELECT vec_id + {k * max_vec} AS vec_id,
               {"embedding" if k == 0 else
                f"list_transform(embedding, (x, i) -> CASE WHEN i = {(k % dim) + 1} "
                f"THEN CAST(x + {k}e-3 AS FLOAT) ELSE x END)"} AS embedding,
               label
        FROM {src('embeddings')}"""))

    max_event = con.execute(f"SELECT max(event_id)+1 FROM {src('events')}").fetchone()[0]
    max_user = con.execute(f"SELECT max(user_id)+1 FROM {src('events')}").fetchone()[0]
    write("events", replicate("events", lambda k: f"""
        SELECT event_id + {k * max_event} AS event_id, ts,
               user_id + {k * max_user} AS user_id,
               event_type, value, props
        FROM {src('events')}"""))

    max_order = con.execute(f"SELECT max(o_orderkey)+1 FROM {src('orders')}").fetchone()[0]
    max_cust = con.execute(f"SELECT max(c_custkey)+1 FROM {src('customer')}").fetchone()[0]
    write("customer", replicate("customer", lambda k: f"""
        SELECT c_custkey + {k * max_cust} AS c_custkey,
               'Customer#' || lpad(CAST(c_custkey + {k * max_cust} AS VARCHAR),
                 9, '0') AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')}"""))
    write("orders", replicate("orders", lambda k: f"""
        SELECT o_orderkey + {k * max_order} AS o_orderkey,
               o_custkey + {k * max_cust} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')}"""))
    write("lineitem", replicate("lineitem", lambda k: f"""
        SELECT l_orderkey + {k * max_order} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM {src('lineitem')}"""))

    for t in ("region", "nation", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"  {t}: copied (dimension, unscaled)")
    print("done")


if __name__ == "__main__":
    main()
