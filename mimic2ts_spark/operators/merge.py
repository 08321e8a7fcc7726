"""MERGE/upsert with partition-pruned rewrite — incremental corpus
maintenance without a table format, the copy-on-write core of what
Delta/Iceberg's MERGE INTO does.

Layout contract: the base table is parquet PARTITIONED BY a
deterministic key bucket (md5-derived, NOT engine-native hash — the
bucket of a key must be stable across engines and sessions). An update
batch then only touches the partitions its keys hash into:

1. bucket the updates, collect the DISTINCT affected bucket ids
   (bounded by n_buckets — a scalar list, never data),
2. read ONLY those partitions of the base (partition pruning does the
   work: the scan's PartitionFilters skip every untouched bucket),
3. full-outer merge on the key (update wins; unmatched update inserts;
   unmatched base row survives),
4. write back with dynamic partition overwrite, so ONLY the affected
   partitions are replaced on disk — at 100 TB an update batch touching
   0.1% of keys rewrites ~0.1% of the table, not all of it.

Bit-exactness: the bucket function is md5-based (stable everywhere) and
the merge itself is pure relational algebra, so the resulting table is
oracle-expressible as a FULL OUTER JOIN in DuckDB.

Commit semantics (disclosed, not hidden): the rewrite OVERWRITES the
same path it lazily read from, relying on Spark's dynamic-partition-
overwrite staging (each task writes to a staging dir; affected
partition dirs are swapped at job commit). A failure DURING the commit
delete/rename phase can leave some affected partitions rewritten and
others stale — the same non-atomic window every path-based
copy-on-write has without a transaction-log table format. Production
hardening is a Delta/Iceberg-style log or a temp-sibling-dir write +
per-partition swap; the partition-pruning and merge algebra here are
unchanged by either.

Table state: write_base persists {key, n_buckets} in _merge_meta.json
next to the partitions (underscore-prefixed ⇒ invisible to the scan).
merge_upsert validates a caller-passed n_buckets against it — a merge
run with the wrong modulus would prune the WRONG partitions and leave
stale duplicate keys alive in untouched buckets, silently.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MERGE_BUCKETS = 32
_META_FILE = "_merge_meta.json"


def write_meta(path: str, key_col: str, n_buckets: int) -> None:
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump({"key": key_col, "n_buckets": n_buckets}, f)


def read_meta(path: str) -> dict | None:
    meta_path = os.path.join(path, _META_FILE)
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)


def key_bucket(key: Column, n_buckets: int = MERGE_BUCKETS) -> Column:
    """Deterministic cross-engine bucket: md5 of the decimal key string,
    low 60 bits, mod n_buckets (non-negative, so Spark pmod == DuckDB %)."""
    code = F.conv(
        F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (code % n_buckets).alias("bucket")


def sql_key_bucket(key: str, n_buckets: int = MERGE_BUCKETS) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {n_buckets}"
    )


def write_base(
    df: DataFrame, path: str, key_col: str, n_buckets: int = MERGE_BUCKETS
) -> None:
    """Materialize the base table in the merge layout (bucket partitions)
    and persist {key, n_buckets} as table state (_merge_meta.json)."""
    df.withColumn("bucket", key_bucket(F.col(key_col), n_buckets)).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)
    write_meta(path, key_col, n_buckets)


def merge_upsert(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_col: str,
    n_buckets: int | None = None,
) -> dict:
    """Apply `updates` to the base table at `base_path`; returns audit
    counts {affected_buckets, n_updates, rows_rewritten}. Only the
    affected bucket partitions are read and rewritten.

    Semantics are MERGE … WHEN MATCHED THEN UPDATE SET * / WHEN NOT
    MATCHED THEN INSERT *: a matched update row REPLACES the whole base
    row (a NULL column in the update lands as NULL — not the base value;
    pinned by test_merge_null_update_overwrites).

    n_buckets defaults to the table's persisted _merge_meta.json; a
    caller-passed value that contradicts it raises (wrong modulus =
    wrong pruning = silent stale-duplicate corruption). Duplicate keys
    in the update batch also raise: the full-outer join would emit one
    merged row per duplicate, multiplying rewritten partitions — which
    duplicate should win is undefined, so fail loudly."""
    meta = read_meta(base_path)
    if meta is not None:
        if n_buckets is not None and n_buckets != meta["n_buckets"]:
            raise ValueError(
                f"--buckets {n_buckets} contradicts the base table's layout "
                f"({meta['n_buckets']} buckets in {_META_FILE}); a merge with "
                "the wrong modulus prunes the wrong partitions"
            )
        n_buckets = meta["n_buckets"]
    elif n_buckets is None:
        n_buckets = MERGE_BUCKETS

    dup = (
        updates.groupBy(key_col).count().where(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"duplicate key {dup[0][key_col]!r} in update batch: which row "
            "wins is undefined — dedupe upstream before merging"
        )

    up = updates.withColumn("bucket", key_bucket(F.col(key_col), n_buckets))
    affected = sorted(
        r["bucket"] for r in up.select("bucket").distinct().collect()
    )  # ≤ n_buckets scalars

    base = spark.read.parquet(base_path).where(F.col("bucket").isin(affected))
    data_cols = [c for c in base.columns if c != "bucket"]

    b = base.alias("b")
    u = up.alias("u")
    merged = b.join(u, F.col(f"b.{key_col}") == F.col(f"u.{key_col}"), "full_outer")
    take_u = F.col(f"u.{key_col}").isNotNull()  # row replacement, not column patch
    picked = merged.select(
        *[
            F.when(take_u, F.col(f"u.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
            for c in data_cols
        ],
        F.when(take_u, F.col("u.bucket")).otherwise(F.col("b.bucket")).alias("bucket"),
    )

    n_updates = up.count()
    rewritten = picked.count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # dynamic mode: only partitions PRESENT in `picked` (the affected
        # buckets) are replaced; untouched bucket directories stay as-is
        picked.write.mode("overwrite").partitionBy("bucket").parquet(base_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return {
        "affected_buckets": affected,
        "n_updates": n_updates,
        "rows_rewritten": rewritten,
    }


def merge_changelog(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_col: str,
    carry_cols: tuple[str, ...] = (),
    n_buckets: int | None = None,
) -> DataFrame:
    """Change-data-feed of applying `updates` to the base — the CDC
    stream a downstream consumer (index refresh, cache invalidation,
    incremental stats) reacts to instead of re-scanning the table:
    (key, op) with op ∈ {'insert', 'update'}, plus old_<c>/new_<c> for
    each carry column. Pure read-side classification (no write), and it
    reads ONLY the affected bucket partitions — the same pruning
    contract as merge_upsert, so an update batch touching 0.1% of keys
    costs 0.1% of the table at 100 TB. The duplicate-key guard matches
    merge_upsert (a CDF with two rows per key is as undefined as the
    merge itself)."""
    meta = read_meta(base_path)
    if meta is not None:
        if n_buckets is not None and n_buckets != meta["n_buckets"]:
            raise ValueError(
                f"--buckets {n_buckets} contradicts the base table's layout "
                f"({meta['n_buckets']} buckets in {_META_FILE})"
            )
        n_buckets = meta["n_buckets"]
    elif n_buckets is None:
        n_buckets = MERGE_BUCKETS
    dup = (
        updates.groupBy(key_col).count().where(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"duplicate key {dup[0][key_col]!r} in update batch: the changelog "
            "would emit two rows per key — dedupe upstream"
        )

    up = updates.withColumn("bucket", key_bucket(F.col(key_col), n_buckets))
    affected = sorted(r["bucket"] for r in up.select("bucket").distinct().collect())
    base = spark.read.parquet(base_path).where(F.col("bucket").isin(affected))

    u = up.alias("u")
    b = base.alias("b")
    j = u.join(b, F.col(f"u.{key_col}") == F.col(f"b.{key_col}"), "left")
    return j.select(
        F.col(f"u.{key_col}").alias(key_col),
        F.when(F.col(f"b.{key_col}").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
        .alias("op"),
        *[F.col(f"b.{c}").alias(f"old_{c}") for c in carry_cols],
        *[F.col(f"u.{c}").alias(f"new_{c}") for c in carry_cols],
    )


def bucket_file_counts(path: str) -> dict[int, int]:
    """Driver-side audit: parquet files per bucket partition."""
    import os

    out: dict[int, int] = {}
    for d in os.listdir(path):
        if d.startswith("bucket="):
            full = os.path.join(path, d)
            out[int(d.split("=")[1])] = sum(
                1 for f in os.listdir(full) if f.endswith(".parquet")
            )
    return out


def compact_buckets(
    spark: SparkSession,
    path: str,
    max_records_per_file: int | None = None,
) -> dict:
    """Small-file compaction — the OPTIMIZE side of table maintenance.
    Repeated partition-pruned MERGEs leave each bucket with one file per
    task per write; at 100 TB the resulting file-count explosion is what
    kills scan planning (and object-store listing). repartition on the
    partition column co-locates each bucket, so the dynamic-overwrite
    rewrite lands one file per bucket — content-identical by
    construction (pure repartition, no expressions). At real scale a
    bucket is not one file's worth of data: pass max_records_per_file
    (the writer's deterministic intra-task splitter) so output files hit
    the parquet sweet spot instead of bucket size. Returns
    {files_before, files_after}."""
    before = bucket_file_counts(path)
    df = spark.read.parquet(path)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        writer = df.repartition("bucket").write.mode("overwrite")
        if max_records_per_file is not None:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        writer.partitionBy("bucket").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "files_before": sum(before.values()),
        "files_after": sum(bucket_file_counts(path).values()),
    }
