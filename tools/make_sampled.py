#!/usr/bin/env python3
"""Build a deterministically SAMPLED corpus dir for the q132/q136
decade-2 oracle pin (VERDICT r12 item 4).

The full-join oracles for q132_prefix_join / q136_containment_join are
infeasible at sf3-organic (~1.9B candidate pairs); a deterministic
1/16 doc subset (doc_id % 16 == 0) shrinks the candidate graph ~256×
while exercising the IDENTICAL engine join/filter path — the engine
reads the sampled dir through the same Tables.load + query code, no
special-casing anywhere.

documents.parquet is filtered; every other table is copied verbatim so
the dir stays a complete fixture layout (the two queries read only
documents, but Verify/local_verify mount all ten tables).

Usage: python3 tools/make_sampled.py <srcDir> <outDir> [modulus]
"""
import os
import shutil
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main():
    src, out = sys.argv[1], sys.argv[2]
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    # the filter is bit_wise_and(doc_id, mod-1)==0, valid only for
    # power-of-two moduli (pyarrow.compute has no modulo kernel)
    assert mod > 0 and (mod & (mod - 1)) == 0, f"modulus {mod} not a power of 2"
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        sp, op = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if t == "documents":
            tab = pq.read_table(sp)
            kept = tab.filter(pc.equal(pc.bit_wise_and(
                tab.column("doc_id"), mod - 1), 0))
            pq.write_table(kept, op, compression="snappy")
            print(f"  documents: {tab.num_rows} -> {kept.num_rows} rows "
                  f"(doc_id % {mod} == 0)")
        else:
            shutil.copyfile(sp, op)
    print(f"sampled corpus at {out}")


if __name__ == "__main__":
    main()
