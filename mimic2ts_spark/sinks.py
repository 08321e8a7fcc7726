"""Sinks (SURVEY.md §2.1 S3/S4/S5).

The reference writes one wide CSV per (stay, source) as a side effect
inside each stay-group task (/root/reference/src/mimic2ts/__init__.py:174)
and a header-only dummy for event-less stays (:217-225). Exact-layout
parity needs per-stay pivoted files with data-dependent width, which no
declarative Spark sink produces — so this is the engine's ONE grouped
pandas escape hatch (`groupBy(stay_id).applyInPandas`), as planned in
SURVEY.md §4 "Sink layout". Everything upstream stays native.

For engine-native output (the recommended path at scale), use
`write_long_parquet`: partitioned parquet with Spark's commit protocol —
retry-safe, unlike the reference's in-task writes.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_stay_matrices(long_df: DataFrame, dst_path: str, name: str) -> DataFrame:
    """Pivot per stay and write `{dst}/{stay_id}/{name}_features.csv`.

    Input must be the dense long form (every tidx 0..total_windows present
    per feature). Output layout parity: rows indexed by feature_id
    (ascending), columns `feature_id, 0..total_windows`
    (/root/reference/README.md:65-77).

    Returns the LAZY produced-stays DataFrame `(stay_id, n_features)` —
    the files are written executor-side when a downstream action runs it
    (write_empty_stay_files consumes it through an anti-join, so one
    action drives both passes). No driver-side stay list is ever
    materialized: at millions of stays the produced set stays
    distributed.
    """

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        stay_id = int(pdf["stay_id"].iloc[0])
        wide = pdf.pivot(index="feature_id", columns="tidx", values="value")
        wide = wide.reindex(sorted(wide.columns), axis=1).sort_index()
        os.makedirs(f"{dst_path}/{stay_id}", exist_ok=True)
        wide.to_csv(f"{dst_path}/{stay_id}/{name}_features.csv")
        return pd.DataFrame({"stay_id": [stay_id], "n_features": [wide.shape[0]]})

    return long_df.groupBy("stay_id").applyInPandas(
        _write, schema="stay_id long, n_features long"
    )


def missing_stays(requested_stays: DataFrame, produced: DataFrame) -> DataFrame:
    """S4 set difference as a real anti-join (requested − produced,
    /root/reference/src/mimic2ts/__init__.py:217-225). No collected
    IN-list: the plan stays a LeftAnti join however many stays exist."""
    return requested_stays.select("stay_id", "total_windows").join(
        produced.select("stay_id"), "stay_id", "left_anti"
    )


def write_empty_stay_files(
    requested_stays: DataFrame, produced: DataFrame, dst_path: str, name: str
) -> None:
    """Header-only CSV for every requested stay with no events (S4),
    written executor-side via foreachPartition.

    Triggering this action also executes the `produced` applyInPandas
    subtree (the per-stay matrix writes) exactly once — one job drives
    the whole sink. Empty-file writes are idempotent (fixed content per
    stay), so task retries are safe.
    """

    def _write_partition(rows) -> None:
        import os as _os

        import pandas as _pd

        for row in rows:
            sid = int(row["stay_id"])
            _os.makedirs(f"{dst_path}/{sid}", exist_ok=True)
            cols = ["feature_id"] + list(range(0, int(row["total_windows"]) + 1))
            _pd.DataFrame(columns=cols).to_csv(
                f"{dst_path}/{sid}/{name}_features.csv", index=False
            )

    missing_stays(requested_stays, produced).foreachPartition(_write_partition)


def write_long_parquet(long_df: DataFrame, dst_path: str, name: str) -> None:
    """Scale-native sink: long-form parquet partitioned by stay bucket.

    Partitioning by raw stay_id would create one directory per stay
    (millions of tiny files at 100 TB); a hash bucket keeps file counts
    bounded while preserving stay locality for downstream readers.
    """
    (
        long_df.withColumn("stay_bucket", F.pmod(F.hash("stay_id"), F.lit(256)))
        .write.mode("overwrite")
        .partitionBy("stay_bucket")
        .parquet(f"{dst_path}/{name}")
    )


def write_manifest(dst_path: str, version: str, runtime_seconds: float, args: dict) -> None:
    """Run manifest (S5 — /root/reference/src/mimic2ts/__main__.py:83-91)."""
    os.makedirs(dst_path, exist_ok=True)
    with open(f"{dst_path}/readme.txt", "w") as f:
        f.write(f"mimic2ts_spark version: {version}\n")
        f.write(f"runtime seconds: {runtime_seconds}\n")
        for k, v in args.items():
            f.write(f"{k}: {v}\n")
