"""Consumer-side utilities: catalog listing, per-stay matrix assembly,
long-form parquet round trip."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mimic2ts_spark.dataset import (
    list_stays,
    load_feature_catalog,
    load_long,
    load_stay_matrix,
)
from mimic2ts_spark.pipeline import ChartEventAggregator, EventsAggregator
from mimic2ts_spark.sinks import write_long_parquet


def test_catalog_and_matrix_assembly(spark, mimic_dir, tmp_path):
    dst = str(tmp_path / "out")
    EventsAggregator(spark, mimic_dir, dst).do_agg()

    assert list_stays(dst) == [1, 2, 3]

    # stay 1 combined matrix over the full catalog, zero-filled
    catalog = [100, 101, 200, 300, 400]
    m = load_stay_matrix(dst, 1, feature_ids=catalog)
    assert list(m.index) == catalog
    assert math.isclose(m.loc[100, "0"], 80 / 3)
    assert m.loc[100, "1"] == 0.0
    assert m.loc[300, "3"] == 25.0
    assert (m.loc[400] == 0.0).all()  # stay 1 has no procedureevents

    # event-less stay: all-zero frame over the catalog
    m3 = load_stay_matrix(dst, 3, feature_ids=catalog)
    assert (m3.fillna(0.0).to_numpy() == 0.0).all() if m3.size else True


def test_load_feature_catalog_reindexes_stay_matrix(spark, mimic_dir, tmp_path):
    """The d_items catalog is the shared feature axis: every stay matrix
    reindexed onto it has exactly the catalog's rows, zero-filled where
    the stay has no events for an item
    (/root/reference/tools/sampleDataset.py:19-22,100-108)."""
    dst = str(tmp_path / "out")
    EventsAggregator(spark, mimic_dir, dst).do_agg()

    catalog = load_feature_catalog(spark, mimic_dir)
    assert catalog == [100, 101, 200, 300, 400]

    m = load_stay_matrix(dst, 1, feature_ids=catalog)
    assert list(m.index) == catalog
    assert math.isclose(m.loc[100, "0"], 80 / 3)
    assert (m.loc[400] == 0.0).all()  # catalog item absent from the stay

    m3 = load_stay_matrix(dst, 3, feature_ids=catalog)
    assert list(m3.index) == catalog
    assert (m3.to_numpy() == 0.0).all()


def test_long_parquet_round_trip(spark, mimic_dir, tmp_path):
    dst = str(tmp_path / "pq")
    agg = ChartEventAggregator(spark, mimic_dir, str(tmp_path))
    write_long_parquet(agg.aggregate(), dst, "chartevents")
    back = load_long(spark, dst, "chartevents")
    assert back.columns == ["stay_id", "feature_id", "tidx", "value"]
    got = {
        (r.stay_id, r.feature_id, r.tidx): r.value
        for r in back.where(F.col("feature_id") == 100).collect()
    }
    assert math.isclose(got[(1, 100, 0)], 80 / 3)
    assert got[(2, 100, 4)] == 8.0
