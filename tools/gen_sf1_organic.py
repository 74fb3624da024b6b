#!/usr/bin/env python3
"""Generate an ORGANIC sf1-scale dataset — same generator FAMILY as the
driver's fixtures, new seed — as an independent datapoint beside the
replication-derived tmp/sf1 (VERDICT r10 item 3).

Usage: python3 tools/gen_sf1_organic.py [outDir] [seed]
       (defaults: tmp/sf1_organic, 4242)

`tools/make_sf1.py` scales sf0.1 by 10x REPLICATION, which preserves
sf0.1's distribution exactly — so distribution-dependent code paths
(band-clique depth, LSH bucket occupancy, quantile-band boundaries,
Poisson join fan-in) are only ever exercised at sf0.1's shape. This
script instead RE-SAMPLES every scaled table at 10x rows from the same
parametric family the driver's generator evidently used, with a new
seed, so those paths see genuinely fresh draws at scale.

The family was reverse-engineered from the sf0.001/0.01/0.1 fixtures
(measured, not assumed — each parameter below was read off the data):

  documents  50,000 rows. 31-word fixed vocab (read from sf0.1), text =
             uniform 10-100 uniform-vocab words, lang ~ {en:.41,
             de/fr/es/zh:.1475}, source ~ uniform src0..src19,
             n_chars = len(text). PLANTED structure matching the
             fixtures' measured rates: ~4.5% of docs are word-flip
             mutations (p_flip=0.02) of an earlier doc (sf0.001: 28
             shingle-jaccard>0.5 pairs per 500 docs, cliques from
             mutation-of-mutation), and ~0.16% are EXACT copies
             (sf0.1: 8 exact-dup pairs per 5,000).
  embeddings 20,000 rows. 64-dim float32, isotropic gaussian normalized
             to unit L2 (fixtures: norm 1.0 +/- 0, within-label cos ~ 0
             => no cluster structure), label ~ uniform 0..9.
  events     1,000,000 rows over 15,000 users (10x sf0.1's 1,500, the
             same axis make_sf1 scales). event_id sequential, ts ~
             uniform over Jan 2024, event_type ~ uniform 5, value ~
             round(Exp(mean=50), 2) (fixtures: mean 49.9, median 34.8
             = 50*ln2), props = {"k": uniform 0..99}.
  customer   150,000 rows. c_name = 'Customer#%09d' (key-derived, the
             source format), c_nationkey ~ uniform 0..24, c_acctbal ~
             round(U(-1000, 10000), 2), c_mktsegment ~ uniform 5.
  orders     1,500,000 rows. o_custkey ~ uniform over customers,
             o_orderstatus ~ uniform {O,P,F}, o_totalprice ~
             round(U(1000, 500000), 2), o_orderdate ~ uniform DAYS
             1995-01-01..2001-08-01, priority ~ uniform 5.
  lineitem   6,000,000 rows. l_orderkey ~ uniform over orders (per-
             order line count is then Poisson(4) — matches the
             fixtures' 1..17 histogram), l_linenumber ~ uniform 1..7
             INDEPENDENT of the order (fixtures show 7 uniform cells
             and per-order counts above 7), l_partkey/l_suppkey ~
             uniform over dims, l_quantity ~ uniform int 1..50,
             l_discount ~ i/100 for i~U{0..10}, l_tax ~ i/100 for
             i~U{0..8}, l_extendedprice ~ round(U(900, 105000), 2)
             (corr with quantity measured ~0.001 — independent),
             l_shipdate ~ uniform DAYS 1995-01-02..2001-11-04
             (independent of o_orderdate: measured diffs span -2399..
             +2496 days), returnflag/linestatus ~ uniform {A,N,R}x{F,O}.
  part/supplier/nation/region  copied UNSCALED from sf0.1 — dimensions,
             exactly as make_sf1.py treats them ("a 10x fact load meets
             the same dimension tables"); FK ranges stay valid.

Deterministic given (seed); timestamps written as naive timestamp[us]
(the driver's current flavor — graft.Tables.load normalizes either
way). Driver-side python (numpy/pyarrow), like make_sf1.py.
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

N_DOCS = 50_000
N_VECS = 20_000
N_EVENTS = 1_000_000
N_USERS = 15_000
N_CUST = 150_000
N_ORDERS = 1_500_000
N_LINES = 6_000_000
N_PARTS = 20_000
N_SUPPS = 1_000

P_MUTATE = 0.045   # sf0.001: 28 near-dup pairs / 500 docs (cliques incl.)
P_FLIP = 0.02      # per-word flip in a mutation -> jaccard 0.89-0.99
P_EXACT = 0.0016   # sf0.1: 8 exact-dup pairs / 5000 docs = 8 copy events


def day_range_us(start, end):
    """Inclusive uniform-day sampler bounds in microseconds since epoch."""
    s = np.datetime64(start).astype("datetime64[D]").astype(np.int64)
    e = np.datetime64(end).astype("datetime64[D]").astype(np.int64)
    return s, e


def write(out, name, table):
    pq.write_table(table, f"{out}/{name}.parquet", compression="snappy")
    print(f"  {name}: {table.num_rows} rows")


def ts_us_from_days(days):
    return (days.astype("datetime64[D]").astype("datetime64[us]"))


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "tmp/sf1_organic"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 4242
    # Optional third arg (r12, VERDICT r11 item 6): DOC/VEC scale
    # multiplier for the second-decade dedup/ANN slope probe. Scales
    # documents and embeddings only — the heavy dedup/ANN queries
    # (q132/q136/q67/q105/q205) read nothing else, and tripling the
    # TPC-H facts would just burn disk for tables the probe never
    # touches. Defaults to 1, which reproduces the exact r11 corpus for
    # a given seed. (At scale != 1 the shared RNG stream advances
    # differently, so the fact tables differ from the scale-1 corpus
    # too — fine for the probe, which only reads docs/vecs.)
    doc_scale = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    global N_DOCS, N_VECS
    N_DOCS *= doc_scale
    N_VECS *= doc_scale
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    # --- vocab read from the fixtures (the family's fixed 31 words) ---
    import duckdb
    con = duckdb.connect()
    vocab = sorted({w for (t,) in con.execute(
        f"select text from read_parquet('{SRC}/documents.parquet') limit 500"
    ).fetchall() for w in t.split(" ")})
    assert len(vocab) == 31, f"vocab drifted: {len(vocab)}"
    vocab = np.array(vocab)

    # --- documents -----------------------------------------------------
    texts = []
    langs_pool = np.array(["en", "de", "fr", "es", "zh"])
    lang_p = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])
    kind = rng.random(N_DOCS)
    for i in range(N_DOCS):
        if i > 20 and kind[i] < P_EXACT:
            texts.append(texts[rng.integers(0, i)])
        elif i > 20 and kind[i] < P_EXACT + P_MUTATE:
            base = np.array(texts[rng.integers(0, i)].split(" "))
            flip = rng.random(len(base)) < P_FLIP
            words = np.where(flip, vocab[rng.integers(0, 31, len(base))], base)
            # a mutation must CHANGE the text (the fixtures' exact-dup
            # rate is only P_EXACT): with P_FLIP=0.02 a 10-100-word doc
            # flips zero words ~33% of the time, and a flip can redraw
            # the same word — force one real substitution in that case
            if (words == base).all():
                j = rng.integers(0, len(base))
                words[j] = vocab[(np.searchsorted(vocab, base[j]) +
                                  rng.integers(1, 31)) % 31]
            texts.append(" ".join(words))
        else:
            n = rng.integers(10, 101)
            texts.append(" ".join(vocab[rng.integers(0, 31, n)]))
    docs = pa.table({
        "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(langs_pool, N_DOCS, p=lang_p), pa.string()),
        "source": pa.array(
            np.char.add("src", rng.integers(0, 20, N_DOCS).astype(str)),
            pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    })
    write(out, "documents", docs)

    # --- embeddings ----------------------------------------------------
    V = rng.standard_normal((N_VECS, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    emb = pa.table({
        "vec_id": pa.array(np.arange(N_VECS), pa.int64()),
        "embedding": pa.array(list(V), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, N_VECS), pa.int32()),
    })
    write(out, "embeddings", emb)

    # --- events --------------------------------------------------------
    t0 = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(np.int64)
    t1 = np.datetime64("2024-01-31T00:00:00").astype("datetime64[us]").astype(np.int64)
    ev = pa.table({
        "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
        "ts": pa.array(rng.integers(t0, t1, N_EVENTS).astype("datetime64[us]"),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
        "event_type": pa.array(rng.choice(
            np.array(["view", "click", "purchase", "signup", "error"]),
            N_EVENTS), pa.string()),
        "value": pa.array(np.round(rng.exponential(50.0, N_EVENTS), 2),
                          pa.float64()),
        "props": pa.array(
            np.char.add(np.char.add('{"k": ',
                        rng.integers(0, 100, N_EVENTS).astype(str)), "}"),
            pa.string()),
    })
    write(out, "events", ev)

    # --- customer ------------------------------------------------------
    cust = pa.table({
        "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
        "c_name": pa.array(
            ["Customer#%09d" % k for k in range(N_CUST)], pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, N_CUST), 2),
                              pa.float64()),
        "c_mktsegment": pa.array(rng.choice(np.array(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]),
            N_CUST), pa.string()),
    })
    write(out, "customer", cust)

    # --- orders --------------------------------------------------------
    d0, d1 = day_range_us("1995-01-01", "2001-08-01")
    orders = pa.table({
        "o_orderkey": pa.array(np.arange(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORDERS), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(np.array(["O", "P", "F"]),
                                             N_ORDERS), pa.string()),
        "o_totalprice": pa.array(
            np.round(rng.uniform(1000, 500000, N_ORDERS), 2), pa.float64()),
        "o_orderdate": pa.array(
            ts_us_from_days(rng.integers(d0, d1 + 1, N_ORDERS)
                            .astype("datetime64[D]")), pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]),
            N_ORDERS), pa.string()),
    })
    write(out, "orders", orders)

    # --- lineitem ------------------------------------------------------
    s0, s1 = day_range_us("1995-01-02", "2001-11-04")
    li = pa.table({
        "l_orderkey": pa.array(rng.integers(0, N_ORDERS, N_LINES), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, N_PARTS, N_LINES), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, N_SUPPS, N_LINES), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, N_LINES), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, N_LINES).astype(np.float64),
                               pa.float64()),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(900, 105000, N_LINES), 2), pa.float64()),
        "l_discount": pa.array(rng.integers(0, 11, N_LINES) / 100.0,
                               pa.float64()),
        "l_tax": pa.array(rng.integers(0, 9, N_LINES) / 100.0, pa.float64()),
        "l_returnflag": pa.array(rng.choice(np.array(["A", "N", "R"]),
                                            N_LINES), pa.string()),
        "l_linestatus": pa.array(rng.choice(np.array(["F", "O"]), N_LINES),
                                 pa.string()),
        "l_shipdate": pa.array(
            ts_us_from_days(rng.integers(s0, s1 + 1, N_LINES)
                            .astype("datetime64[D]")), pa.timestamp("us")),
    })
    write(out, "lineitem", li)

    # --- dimensions: copied unscaled, as in make_sf1.py ---------------
    for t in ["part", "supplier", "nation", "region"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"  {t}: copied from {SRC}")
    print(f"done -> {out} (seed {seed})")


if __name__ == "__main__":
    main()
