"""Interval → bucket-instant operators (SURVEY.md §2.8 I1, I2; §2.3 E9).

The reference materializes, per dosing/procedure interval, every timestep
instant the interval touches — `range(start, end + step, step)` — then
spreads the dose evenly across those instants and explodes
(/root/reference/src/mimic2ts/__init__.py:319-334). Here the range is a
native `sequence` (ArrayType column, JVM-side) and the explode is the
built-in generator — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def interval_instants(start_epoch: Column, end_epoch: Column, step_seconds: int) -> Column:
    """Array of epoch instants the interval [start, end] touches (I1).

    Exact parity with Python `range(start, end + step, step)`
    (/root/reference/src/mimic2ts/__init__.py:319-327): that range is
    end-EXCLUSIVE of `end + step`, i.e. its last element is the largest
    `start + k*step <= end + step - 1`. Spark's `sequence(a, b, s)` is
    end-INCLUSIVE of b when b lands on the step grid, so the matching stop
    bound is `end + step - 1`:

    - (end-start) % step == 0 → last instant == end        (k = d/step)
    - otherwise               → last instant overshoots end (k = d//step + 1)

    Always ≥ 1 element (start == end → [start]), as the reference comments.
    """
    return F.sequence(
        start_epoch,
        end_epoch + F.lit(step_seconds - 1),
        F.lit(step_seconds),
    )


def spread_evenly(value: Column, instants: Column) -> Column:
    """Divide a dose evenly over the instants its interval spans (E9).

    Parity: `value / len(event_epoch_time)`
    (/root/reference/src/mimic2ts/__init__.py:329-332).
    """
    return value / F.size(instants)
