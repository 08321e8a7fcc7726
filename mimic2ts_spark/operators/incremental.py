"""Incremental aggregate maintenance: the nightly-cadence alternative to
full recompute. A materialized per-key aggregate is kept as MERGEABLE
PARTIAL STATE — (count, integer-cents sum) — so absorbing a delta batch
is `union old-state with delta-state, re-aggregate`, touching only
state-sized and delta-sized inputs, never the full history.

Shape at scale: the old state is ~|keys| rows (≪ facts), the delta scan
is partition-pruned to the new day's files (pushed predicate), and the
merge is ONE hash aggregate over (state ∪ delta-state). At 100 TB this
turns a full-history shuffle into a keys+delta shuffle — the reason
production rollups are stored as state, not as finished means.

Determinism: sums are integer cents (CLAUDE.md float rule); the final
mean is a single float division done only at read-out, identically in
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CENTS = 100


def partial_mean_state(
    df: DataFrame, keys: list[str], value_col: str = "value"
) -> DataFrame:
    """Mergeable per-key state: (n, sum_cents)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr(f"CAST(round({value_col} * {CENTS}) AS BIGINT)")).alias(
            "sum_cents"
        ),
    )


def merge_mean_states(old: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """(keys, n, sum_cents, mean): old ∪ delta re-aggregated. Keys absent
    from one side merge as that side's state alone (union semantics)."""
    merged = (
        old.unionByName(delta)
        .groupBy(*keys)
        .agg(F.sum("n").alias("n"), F.sum("sum_cents").alias("sum_cents"))
    )
    return merged.select(
        *keys,
        "n",
        "sum_cents",
        (F.col("sum_cents").cast("double") / F.lit(CENTS) / F.col("n")).alias("mean"),
    )


def sql_merged_mean(
    table: str, keys: list[str], value_col: str, split_pred: str
) -> str:
    """Oracle: the full-history single pass MUST equal state-merge — the
    correctness contract of incremental maintenance. `split_pred` is
    only echoed to document what the Spark side pruned by; the oracle
    aggregates everything in one scan."""
    ks = ", ".join(keys)
    return f"""
-- spark side merges state(NOT ({split_pred})) with state({split_pred});
-- the oracle recomputes from scratch: equality IS incremental correctness
SELECT {ks}, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round({value_col} * {CENTS}) AS BIGINT)) AS BIGINT)
           AS sum_cents,
       CAST(sum(CAST(round({value_col} * {CENTS}) AS BIGINT)) AS DOUBLE)
           / {CENTS} / count(*) AS mean
FROM {table}
GROUP BY {ks}
"""
