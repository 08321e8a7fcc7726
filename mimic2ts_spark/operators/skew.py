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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: Column,
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: the dim side is replicated `buckets`× with
    an explicit salt column and the fact side deterministically salted,
    so one hot fact key spreads across `buckets` reducers instead of
    one straggler task. For sort-merge joins AQE's skew split usually
    suffices — this operator is for the cases it can't touch (shuffled
    hash joins, aggregations stacked on the join key downstream, or a
    single key hot enough that splitting map outputs still leaves one
    reduce partition). Replication multiplies the dim by `buckets`:
    only use when |dim|·buckets ≪ |fact| — the oracle is the plain
    join (salting never changes the result set)."""
    salted_fact = fact.withColumn("_salt", F.pmod(F.hash(salt_from), F.lit(buckets)))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_fact.join(salted_dim, [key, "_salt"]).drop("_salt")
