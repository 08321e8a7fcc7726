"""Build an N-fold scale-up of a testdata dir by unioning id-offset
copies (DuckDB, driver-side) — used for scaling sweeps beyond the shipped
sf0.1. Note the copies duplicate content: documents/embeddings become a
deliberately duplicate-heavy corpus, which stress-tests the dedup family
with genuine near-dup clusters (README "Measured scaling").

Usage: python scripts/make_scale_dataset.py [src_dir] [dst_dir] [factor]
Then:  SPARK_GRAFT_SF_DIR=<dst_dir> python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> {column: logical key domain}. Columns sharing a domain (the
# order key appears in both orders and lineitem) must shift by ONE shared
# offset per copy, or copy i of lineitem stops joining to copy i of
# orders and the TPC-H bench queries silently change shape.
KEYED = {
    "lineitem": {"l_orderkey": "orderkey"},
    "orders": {"o_orderkey": "orderkey"},
    "events": {"event_id": "event_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    # one offset per key domain = max over every (table, column) in it + 1
    domain_off: dict[str, int] = {}
    for t, keymap in KEYED.items():
        for col, dom in keymap.items():
            mx = con.execute(f"SELECT max({col}) + 1 FROM '{SRC}/{t}.parquet'").fetchone()[0]
            domain_off[dom] = max(domain_off.get(dom, 0), mx)
    for t, keymap in KEYED.items():
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sels = []
        for i in range(N):
            proj = ", ".join(
                f"{c} + {i * domain_off[keymap[c]]} AS {c}" if c in keymap else c
                for c in cols
            )
            sels.append(f"SELECT {proj} FROM '{SRC}/{t}.parquet'")
        con.execute(
            f"COPY ({' UNION ALL '.join(sels)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(t, n)
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
    print("done:", DST)


if __name__ == "__main__":
    main()
