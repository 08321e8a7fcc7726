"""Structured Streaming variants of the engine's bucketing semantics
(SURVEY.md §2.12 — the reference is batch-only; these are the Spark-native
streaming analogues the `events` table invites).

- Tumbling-window aggregation == the reference's E6 bucketing with
  `floor((t - epoch_hour_origin)/step)`.
- Watermark discard == the reference's P4 late-drop.
- Early-event clamp has no streaming analogue (no per-key origin in a
  stream without state); the stateful variant would use
  applyInPandasWithState keyed by stay.

`run_tumbling_available_now` drives a parquet-file stream to completion
synchronously (availableNow trigger + memory sink) so batch oracles can
check it: in complete output mode every window is emitted, making the
result equal to the equivalent batch GROUP BY.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # physical TIMESTAMP(NANOS) → long ns
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (nanos ts → timestamp).

    The file stream source requires a *directory* to monitor; the testdata
    ships a single file, so it is exposed through a symlinked staging dir
    (a real deployment points this at the landing directory)."""
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stage = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(f"{sf_dir}/events.parquet", f"{stage}/events.parquet")
    raw = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(stage)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_agg(stream: DataFrame, scale: int = 100) -> DataFrame:
    """1-hour tumbling windows per event_type: exact integer-cents sum +
    count (same cross-engine-exact arithmetic as the batch harness)."""
    return (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.sum(F.round(F.col("value") * scale, 0).cast("long")).alias("cents"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            (F.col("cents").cast("double") / scale).alias("sum_value"),
            "n_events",
        )
    )


def run_tumbling_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stream to completion; return the final (static) result."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        tumbling_agg(events_stream(spark, sf_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
