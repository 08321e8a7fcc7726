"""Consumption utilities — the engine-side equivalents of the reference's
torch dataset (/root/reference/tools/sampleDataset.py, minus tensors:
tensor conversion stays out of engine scope, SURVEY.md §1.1).

Covers: S6 directory-listing catalog (:19-22), U1 per-source concat
(:96-98), R2 reindex-to-feature-catalog with zero fill (:101-106).

Two documented divergences from the reference (SURVEY.md §3.3 "latent
behaviors to note, not replicate"): the filename typo
("inputevent_features.csv") that silently drops inputevents from training
data is fixed here, and procedureevents is included.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

DEFAULT_SOURCES = ("chartevents", "inputevents", "outputevents", "procedureevents")


def list_stays(processed_path: str) -> list[int]:
    """S6: the stay catalog is the set of per-stay output directories."""
    return sorted(
        int(d) for d in os.listdir(processed_path) if d.isdigit()
    )


def load_feature_catalog(spark: SparkSession, mimic_path: str) -> list[int]:
    """The full feature catalog = every itemid in d_items, sorted.

    The reference consumer reindexes every stay matrix onto this axis
    (/root/reference/tools/sampleDataset.py:19-22 loads the itemids,
    :100-108 reindexes + zero-fills) so all stays share one feature
    dimension. d_items is a dimension table (thousands of rows), so the
    collect is bounded — this is a driver-side axis, not data."""
    from mimic2ts_spark import sources

    rows = (
        sources.read_mimic_csv(spark, mimic_path, "d_items")
        .select("itemid")
        .distinct()
        .collect()
    )
    return sorted(int(r.itemid) for r in rows)


def load_stay_matrix(
    processed_path: str,
    stay_id: int,
    feature_ids: list[int] | None = None,
    sources: tuple[str, ...] = DEFAULT_SOURCES,
) -> pd.DataFrame:
    """One stay's combined wide matrix: stack the per-source matrices (U1),
    reindex rows onto the full feature catalog, zero-fill (R2).

    Per-stay matrices are small by construction (features × buckets), so
    this is a driver/consumer-side pandas path, same as the reference.
    """
    frames = []
    for src in sources:
        path = f"{processed_path}/{stay_id}/{src}_features.csv"
        if os.path.exists(path):
            df = pd.read_csv(path)
            if not df.empty:
                frames.append(df)
    if frames:
        combined = pd.concat(frames).set_index("feature_id")
    else:
        combined = pd.DataFrame(columns=["0"]).rename_axis("feature_id")
    if feature_ids is not None:
        combined = combined.reindex(feature_ids)
    return combined.astype("float64").fillna(0.0)


def load_long(spark: SparkSession, dst_path: str, source: str) -> DataFrame:
    """Scale-native consumption: read the partitioned long-form parquet
    written by sinks.write_long_parquet — pushdown/pruning apply, and a
    `stay_bucket` filter prunes partitions."""
    return spark.read.parquet(f"{dst_path}/{source}").drop("stay_bucket")
