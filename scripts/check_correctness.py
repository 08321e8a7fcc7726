"""Local mirror of the driver's t2 correctness gate: run every
__spark_entry__.queries() entry at a scale factor, run the matching
oracle_sql() in DuckDB over the same parquet, compare row count + columns
+ order-insensitive values (exact — the driver hashes).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402
from mimic2ts_spark.session import get_spark, release_storage  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    if problems:
        return problems
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(float)
            bv = bv.astype(float)
            same = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not same.all():
                idx = int(np.argmax(~same))
                problems.append(
                    f"col {col}: {int((~same).sum())} mismatches, first at {idx}: "
                    f"spark={av[idx]!r} oracle={bv[idx]!r} diff={abs(av[idx]-bv[idx])!r}"
                )
        else:
            same = (av == bv) | (pd.isna(av) & pd.isna(bv))
            if not same.all():
                idx = int(np.argmax(~same))
                problems.append(
                    f"col {col}: {int((~same).sum())} mismatches, first at {idx}: "
                    f"spark={av[idx]!r} oracle={bv[idx]!r}"
                )
    return problems


def main() -> int:
    t_start = time.time()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_correctness")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            release_storage(spark)  # bound cached blocks per-query
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(spark_pdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            # Driver-hash parity: DuckDB HUGEINT/DECIMAL outputs coerce to
            # float64 in .df() and slip past the float comparison below, but
            # the driver's value-hash distinguishes the representation from
            # Spark's LONG (r03: q_pack_sequences). Fail loudly pre-commit.
            bad_types = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, [str(t).upper() for t in rel.types])
                if "HUGEINT" in t or t.startswith("DECIMAL")
            ]
            if bad_types:
                print(
                    f"FAIL {name}: oracle emits driver-unsafe dtypes "
                    f"{bad_types} — CAST to BIGINT/DOUBLE in the SQL"
                )
                n_fail += 1
                continue
            oracle_pdf = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(spark_pdf, oracle_pdf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"PASS {name}: {len(spark_pdf)} rows [{time.time()-t0:.1f}s]")

    # smoke-check entry()
    if not only:
        n = entrymod.entry(spark).count()
        print(f"entry(): {n} rows at sf0.001")
    print("FAILURES:", n_fail)
    print(f"TOTAL: {time.time() - t_start:.1f}s for "
          f"{len(only) if only else len(queries)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
