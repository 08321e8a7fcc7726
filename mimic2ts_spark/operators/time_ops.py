"""Time/bucketing scalar expressions (SURVEY.md §2.3 E1, E6, E7, E8).

The reference does all temporal arithmetic on int64 epoch seconds obtained
by parsing "%Y-%m-%d %H:%M:%S" strings and flooring ns→s
(/root/reference/src/mimic2ts/__init__.py:84-87,112-115). Every function
here is a native Column expression — JVM-side, codegen'd, no Python UDFs
(the reference uses row-wise pandas apply for all of these).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mimic2ts_spark.schemas import TIMESTAMP_FMT


def epoch_seconds(ts: Column | str) -> Column:
    """Timestamp column → int64 epoch seconds (floored).

    Parity: `pd.to_datetime(...).astype(int64) // 10**9`
    (/root/reference/src/mimic2ts/__init__.py:86-87). `unix_timestamp`
    truncates sub-second parts, which equals floor for post-epoch data.
    """
    return F.unix_timestamp(F.col(ts) if isinstance(ts, str) else ts)


def parse_epoch_seconds(ts: Column | str, fmt: str = TIMESTAMP_FMT) -> Column:
    """String timestamp ("%Y-%m-%d %H:%M:%S") → int64 epoch seconds (E1)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_timestamp(F.to_timestamp(c, fmt))


def total_windows(out_epoch: Column, in_epoch: Column, step_seconds: int) -> Column:
    """Stay length in buckets: floor((outtime - intime) / step) (E8).

    Parity: /root/reference/src/mimic2ts/__init__.py:93-95 (floor division;
    the reference's own test asserts ceil — floor+1 == ceil except exact
    multiples, where the executable floor+1 behavior wins; SURVEY.md §2.3).
    """
    return F.floor((out_epoch - in_epoch) / F.lit(step_seconds)).cast("long")


def bucket_index(event_epoch: Column, in_epoch: Column, step_seconds: int) -> Column:
    """Tumbling-bucket index: floor((event - intime) / step) (E6).

    floor (toward -inf), not truncation: events before intime must land in
    negative buckets so the clamp (E7) can pull them to 0
    (/root/reference/src/mimic2ts/__init__.py:154-158 uses np.floor_divide).
    """
    return F.floor((event_epoch - in_epoch) / F.lit(step_seconds)).cast("long")


def clamp_floor(c: Column, lo: int = 0) -> Column:
    """Clamp early events into bucket `lo` (E7).

    Parity: `x if x > 0 else 0` (/root/reference/src/mimic2ts/__init__.py:160-162).
    """
    return F.greatest(F.lit(lo).cast("long"), c)
