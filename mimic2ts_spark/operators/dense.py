"""Dense time-axis materialization + imputation (SURVEY.md §2.4 J2,
§2.6 W1/W2).

The reference reindexes each per-(stay, feature) series onto the full
bucket domain 0..total_windows and fills gaps with 0.0, optionally forward
filling first (/root/reference/src/mimic2ts/__init__.py:124-136). Here:

- The dense domain is `sequence(0, total_windows)` exploded per observed
  (stay, feature) pair — a generator, not a join against a materialized
  calendar table, so it scales linearly with output size and never
  shuffles the big side twice.
- Forward fill is the one true window function in the engine:
  `last(value, ignorenulls=True)` over rows unboundedPreceding..current.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_reindex(
    agg: DataFrame,
    value_col: str = "value",
    key_cols: tuple[str, str] = ("stay_id", "feature_id"),
    tidx_col: str = "tidx",
    max_col: str = "total_windows",
) -> DataFrame:
    """Left-join the sparse (key, tidx, value) aggregate onto the dense
    bucket domain 0..max_col (J2).

    `agg` must carry `max_col` (constant per stay — it rides along from the
    broadcast stay join, so no second join with the dim table is needed).
    Gap rows get NULL `value_col` (imputation is a separate operator so
    ffill-then-zero ordering is explicit, as in the reference :128-136).

    Implementation (single-pass): collapse each series to a tidx→value map
    (one shuffle of already-reduced data), then explode the dense
    `sequence(0, max)` domain with a map lookup. Joining against a
    generated calendar, or unioning a "missing buckets" branch, would
    reference the aggregate subtree twice — Spark physically recomputes
    duplicated subplans, doubling the upstream scan+join+agg at any scale.
    """
    keys = list(key_cols)
    series = agg.groupBy(*keys, max_col).agg(
        F.map_from_entries(F.collect_list(F.struct(tidx_col, value_col))).alias("_m")
    )
    return series.select(
        *keys,
        max_col,
        F.explode(F.sequence(F.lit(0).cast("long"), F.col(max_col))).alias(tidx_col),
        "_m",
    ).select(
        *keys,
        max_col,
        tidx_col,
        F.element_at(F.col("_m"), F.col(tidx_col)).alias(value_col),
    )


def forward_fill(
    df: DataFrame,
    value_col: str = "value",
    key_cols: tuple[str, str] = ("stay_id", "feature_id"),
    order_col: str = "tidx",
) -> DataFrame:
    """Carry last observation forward within each series (W1).

    Parity: `fillna(method="ffill")` after reindex
    (/root/reference/src/mimic2ts/__init__.py:128-132). Frame is
    unboundedPreceding..currentRow; residual leading NULLs are left for
    `zero_fill` (the reference applies ffill THEN zero-fill — ordering
    matters and is pinned by tests).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(value_col, F.last(value_col, ignorenulls=True).over(w))


def zero_fill(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Impute remaining gaps with 0.0 (W2).

    Parity: `fillna(0.0)` (/root/reference/src/mimic2ts/__init__.py:133-136).
    """
    return df.na.fill({value_col: 0.0})
