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


# --- ordered-fold smoothing (EMA) -----------------------------------------

EMA_ALPHA_NUM = 1
EMA_ALPHA_DEN = 8  # alpha = 1/8


def ema_final(values_sorted: Column) -> Column:
    """Final exponential moving average of an ORDERED double array as a
    single left-to-right fold: ema' = ema + (v − ema)·(1/8), seeded 0.0.

    Why a fold and not a window: the recurrence is inherently
    sequential, but per KEY — `aggregate` over the key's sorted value
    array runs it JVM-side in one pass with zero Python and zero extra
    shuffles (the groupBy that built the array already co-located the
    key). Float64 with a fixed op order is bit-identical to DuckDB's
    list_reduce over the same ordering (CLAUDE.md: left-to-right only —
    no reassociation exists in a fold)."""
    return F.aggregate(
        values_sorted,
        F.lit(0.0),
        lambda acc, v: acc + (v - acc) * (F.lit(EMA_ALPHA_NUM) / F.lit(EMA_ALPHA_DEN)),
    )


def sql_ema_final(list_expr: str) -> str:
    """DuckDB mirror: list_reduce over the same ordered list, seeded by
    prepending 0.0 (list_reduce has no init parameter)."""
    return (
        f"list_reduce(list_prepend(0.0, {list_expr}), "
        f"(acc, v) -> acc + (v - acc) * ({EMA_ALPHA_NUM} / {EMA_ALPHA_DEN}.0))"
    )
