"""Composable DataFrame operators — each maps a row of SURVEY.md §2 to a
native Spark expression or a small DataFrame transformation. All are pure
functions DataFrame -> DataFrame / Column -> Column; no UDFs in this
package except the clearly-marked pandas-UDF escape hatches.
"""

from mimic2ts_spark.operators.time_ops import (
    epoch_seconds,
    parse_epoch_seconds,
    bucket_index,
    clamp_floor,
    total_windows,
)
from mimic2ts_spark.operators.intervals import interval_instants, spread_evenly
from mimic2ts_spark.operators.dense import dense_reindex, forward_fill, zero_fill
from mimic2ts_spark.operators.reshape import pivot_wide

__all__ = [
    "epoch_seconds",
    "parse_epoch_seconds",
    "bucket_index",
    "clamp_floor",
    "total_windows",
    "interval_instants",
    "spread_evenly",
    "dense_reindex",
    "forward_fill",
    "zero_fill",
    "pivot_wide",
]
