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

KEYED = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t, keys in KEYED.items():
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        mx = {
            k: con.execute(f"SELECT max({k}) + 1 FROM '{SRC}/{t}.parquet'").fetchone()[0]
            for k in keys
        }
        sels = []
        for i in range(N):
            proj = ", ".join(
                f"{c} + {i * mx[c]} AS {c}" if c in mx else c for c in cols
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
