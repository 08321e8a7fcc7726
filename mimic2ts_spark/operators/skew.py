"""Skew mitigation: salted two-stage aggregation.

AQE's skew-join split handles skewed JOINS, but a groupBy whose key domain
is tiny (e.g. 6 event types across 1000 executors) under-parallelizes the
reduce side no matter how AQE coalesces: one reducer per hot key. Salting
splits each hot key across `buckets` reducers in stage 1 and combines the
partials in stage 2 — the classic pattern, expressed as a reusable
operator. With the engine's integer-scaled sums the result is bit-equal to
the direct aggregation (addition is associative over longs), so the
DuckDB oracle is just the plain GROUP BY.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_exact(
    df: DataFrame,
    keys: Sequence[str],
    value: Column,
    alias: str,
    salt_from: Column,
    buckets: int = 16,
    scale: int = 100,
) -> DataFrame:
    """Two-stage exact sum (+count) over `keys`, salted by a deterministic
    per-row expression (`salt_from` — any high-entropy column; never
    rand(), which breaks retry determinism)."""
    cents = F.round(value * scale, 0).cast("long")
    stage1 = (
        df.withColumn("_salt", F.pmod(F.hash(salt_from), F.lit(buckets)))
        .groupBy(*keys, "_salt")
        .agg(F.sum(cents).alias("_partial"), F.count(F.lit(1)).alias("_n"))
    )
    return stage1.groupBy(*keys).agg(
        (F.sum("_partial").cast("double") / F.lit(float(scale))).alias(alias),
        F.sum("_n").alias("n_rows"),
    )
