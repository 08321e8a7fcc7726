"""Typed scans (SURVEY.md §2.1 S1/S2) and the stay dimension build.

The reference reads every event CSV with one shared dtype dict and
`assume_missing=True` (/root/reference/src/mimic2ts/__init__.py:240-245)
and the dims eagerly with pandas (:74-75). Here every scan is a
schema-first `spark.read` — no inference pass, columns pruned by Catalyst,
partition sizing left to `spark.sql.files.maxPartitionBytes` (the Spark
analogue of the reference's `blocksize` knob, :236).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic2ts_spark import schemas
from mimic2ts_spark.operators.time_ops import parse_epoch_seconds, total_windows

_TABLES = {
    "icustays": schemas.ICUSTAYS,
    "d_items": schemas.D_ITEMS,
    "chartevents": schemas.CHARTEVENTS,
    "inputevents": schemas.INPUTEVENTS,
    "outputevents": schemas.OUTPUTEVENTS,
    "procedureevents": schemas.PROCEDUREEVENTS,
}


def read_mimic_csv(spark: SparkSession, mimic_path: str, table: str) -> DataFrame:
    """Schema-first CSV scan of a MIMIC icu/ table (S1/S2).

    enforceSchema=false makes Spark check the file header against the
    declared schema instead of binding columns by position — a reordered
    or truncated export then fails loudly at scan time rather than
    silently shifting values into the wrong columns (nulls everywhere
    downstream). Costs one header-row comparison per file."""
    return (
        spark.read.schema(_TABLES[table])
        .option("header", True)
        .option("enforceSchema", False)
        .csv(f"{mimic_path}/icu/{table}.csv")
    )


def load_stays(
    spark: SparkSession, mimic_path: str, timestep_seconds: int
) -> DataFrame:
    """The broadcastable stay dimension: (stay_id, intime, outtime,
    total_windows) with times as epoch seconds.

    Parity: /root/reference/src/mimic2ts/__init__.py:84-98 (driver-side
    pandas there; a broadcast dim DataFrame here — same J1 semantics,
    SURVEY.md §2.4).
    """
    stays = read_mimic_csv(spark, mimic_path, "icustays")
    stays = stays.select(
        "stay_id",
        parse_epoch_seconds("intime").alias("intime"),
        parse_epoch_seconds("outtime").alias("outtime"),
    )
    return stays.withColumn(
        "total_windows", total_windows(F.col("outtime"), F.col("intime"), timestep_seconds)
    )


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Harness-table loader for /root/testdata/sf*/ (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
