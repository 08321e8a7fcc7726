"""Compute-spread helper: input-split parallelism follows BYTES, but
hash-heavy projections (per-token md5, minhash signatures, gram scoring)
are compute-dense per byte — a few-MB corpus lands in one file split and
serializes onto one core while 31 idle. `ensure_parallelism` inserts a
cheap O(input) round-robin repartition ONLY when the scan is narrower
than the cluster, so already-wide 100 TB inputs pay nothing.

Safe only for partition-invariant downstream logic (true for every user
here: aggregations, sorted bucket collects, dropDuplicates)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    # Anything already downstream of a shuffle is partitioned by
    # spark.sql.shuffle.partitions — and, more important, converting such
    # a plan to an RDD to COUNT its partitions finalizes the AQE plan,
    # which executes the upstream shuffle stages eagerly (the whole query
    # would run twice). Only narrow scan-shaped plans need the check.
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    if any(k in plan for k in ("Join", "Aggregate", "Repartition", "Window", "Generate")):
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def write_bucketed(
    df: DataFrame, key: str, table: str, buckets: int = 32, path: str | None = None
) -> None:
    """Persist as a bucketed table: pre-hash-partitioned AND sorted by
    `key`, so every future equi-join/aggregation on `key` skips its
    shuffle entirely (the classic pay-the-shuffle-once pattern for fact
    tables that are joined repeatedly — at 100 TB the dominant cost of a
    star join is exactly this exchange)."""
    writer = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
