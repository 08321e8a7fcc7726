"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``mimic2ts_spark.harness`` — the driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mimic2ts_spark import harness


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return harness.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # epoch math must be timezone-free for oracle parity
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, (fn, _) in harness.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for side-effecting /
    non-SQL-expressible ops → driver records rows-only checks)."""
    return {
        name: sql for name, (_, sql) in harness.REGISTRY.items() if sql is not None
    }
