"""Long → wide pivot (SURVEY.md §2.9 R1).

The engine stays long-form everywhere (SURVEY.md §1.3 — dynamic-width
schemas are hostile to Catalyst); the wide feature×tidx matrix exists only
at the sink boundary or on explicit request. The reference produces it
implicitly by stacking per-feature Series
(/root/reference/src/mimic2ts/__init__.py:170-174).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_wide(
    df: DataFrame,
    row_key: Sequence[str] = ("stay_id", "feature_id"),
    pivot_col: str = "tidx",
    value_col: str = "value",
    pivot_values: Sequence[int] | None = None,
    agg: str = "first",
) -> DataFrame:
    """Pivot the long form into one column per tidx.

    Passing `pivot_values` explicitly keeps the schema static (no extra
    distinct-scan job) — required for streaming sinks and strongly
    preferred at scale. `agg` is "first" when upstream already aggregated
    to one row per (key, tidx), else "avg"/"sum".
    """
    aggf = {"first": F.first, "avg": F.avg, "sum": F.sum}[agg](value_col)
    p = df.groupBy(*row_key)
    if pivot_values is not None:
        piv = p.pivot(pivot_col, list(pivot_values))
    else:
        piv = p.pivot(pivot_col)
    return piv.agg(aggf)
