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
    """Schema-first CSV scan of a MIMIC icu/ table (S1/S2), resolved BY
    NAME against the file header.

    Real MIMIC exports carry more columns than the engine needs and column
    order varies between dataset versions; a purely positional
    schema-apply would silently shift values into the wrong columns. Like
    the reference's partial dtype dict keyed by column name
    (/root/reference/src/mimic2ts/__init__.py:12-46,240-245), the header
    row (one tiny driver-side job) maps each file column to its declared
    type — undeclared columns scan as strings and are pruned by the
    projection, a missing REQUIRED column fails with a clear error, and
    enforceSchema=false still cross-checks every file of a multi-file
    glob against the constructed header order."""
    declared = _TABLES[table]
    path = f"{mimic_path}/icu/{table}.csv"
    header_line = spark.read.text(path).first()
    if header_line is None:
        raise ValueError(f"{path} is empty — no header row")
    header = [c.strip().strip('"') for c in header_line[0].split(",")]
    by_name = {f.name: f for f in declared.fields}
    missing = sorted(set(by_name) - set(header))
    if missing:
        raise ValueError(f"{path} is missing required columns {missing}; header={header}")
    from pyspark.sql import types as T

    file_schema = T.StructType(
        [by_name.get(c, T.StructField(c, T.StringType())) for c in header]
    )
    df = (
        spark.read.schema(file_schema)
        .option("header", True)
        .option("enforceSchema", False)
        .csv(path)
    )
    return df.select(*by_name)


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
    return memo_read_parquet(spark, f"{sf_dir}/{name}.parquet")


# --- memoized source-read resolution (r15, guide §1.2 "pre-resolved reads") --
#
# Every fresh `spark.read.parquet(path)` pays ~55-70 ms of driver-side
# work (file listing, footer schema read, relation resolution) — measured
# r15 on this box, best-of-5 per table. A many-query session (bench: 153
# queries × 3 rounds × ~2 source tables each) re-resolves the SAME
# immutable files hundreds of times, and that fixed cost dominates the
# sub-second query tail (VERDICT r14 #1). The memo returns the
# already-resolved DataFrame (an immutable lazy plan — NO data is cached,
# nothing survives the process, every action still computes from the
# parquet bytes), keyed on the session object plus a content fingerprint
# (size, mtime_ns per file — the r09 data-grade memo rule), so an
# in-process rewrite of the file is a memo miss. Deliberately NOT
# registered with session.register_plan_cache: the plan holds no
# storage and is always recomputable, so release_storage must not (and
# need not) clear it.

_READ_MEMO: dict = {}


def _file_fingerprint(path: str) -> tuple:
    import os

    try:
        if os.path.isdir(path):
            out = []
            for n in sorted(os.listdir(path)):
                st = os.stat(os.path.join(path, n))
                out.append((n, st.st_size, st.st_mtime_ns))
            return tuple(out)
        st = os.stat(path)
        return (st.st_size, st.st_mtime_ns)
    except OSError:
        return ("missing",)


def memo_read_parquet(spark: SparkSession, path: str) -> DataFrame:
    key = (spark, path, _file_fingerprint(path))
    df = _READ_MEMO.get(key)
    if df is None:
        # testdata `events.ts` is physical TIMESTAMP(NANOS); resolving it
        # requires the legacy read-as-long flag (harness._t's contract).
        # Set session-wide before ANY memoized resolution so entry order
        # can never matter (pre-memo, a raw events read only worked when
        # a prior _t call had already set the conf).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        _READ_MEMO[key] = df
    return df
