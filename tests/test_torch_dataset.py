"""Torch-facing SampleDataset wrapper: (X, Y) assembly parity with
/root/reference/tools/sampleDataset.py:77-110, hand-built fixture values.

torch is absent in this container, so the pinned surface is the numpy
fallback — identical values/shapes to the tensor path (torch.from_numpy
is zero-copy over the same arrays)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from mimic2ts_spark.pipeline import EventsAggregator
from mimic2ts_spark.torch_dataset import SampleDataset


def _build(spark, mimic_dir, tmp_path) -> str:
    dst = str(tmp_path / "out")
    EventsAggregator(spark, mimic_dir, dst).do_agg()
    return dst


def test_sample_dataset_getitem_matches_hand_fixture(spark, mimic_dir, tmp_path):
    dst = _build(spark, mimic_dir, tmp_path)
    catalog = [100, 101, 200, 300, 400]
    labels = pd.DataFrame(index=[1, 2, 3], data={"label": [1.0, 0.0, 1.0]})

    ds = SampleDataset(labels, dst, feature_ids=catalog)
    assert len(ds) == 3
    assert ds.stay_ids == [1, 2, 3]  # catalog from output dirs (:19-22)

    x, y = ds[0]  # stay 1
    # (features on the full catalog) x (6 buckets: total_windows=5)
    assert x.shape == (5, 6)
    assert y.shape == (1,) and y[0] == 1.0
    # hand-built row for itemid 100 (conftest fixture: bucket-0 mean 80/3,
    # bucket-2 value 30, late event dropped, gaps zero-filled)
    assert np.allclose(x[0], [80 / 3, 0.0, 30.0, 0.0, 0.0, 0.0])
    # itemid 101: only a null-valuenum text event -> all zeros after fill
    assert (x[1] == 0.0).all()
    # itemid 300 (outputevents): stay 1 bucket 3 = 25.0
    assert x[3][3] == 25.0
    # itemid 400 (procedureevents): absent from stay 1 -> zero row
    assert (x[4] == 0.0).all()

    # event-less stay 3 (S4 dummy files): all-zero matrix, still full axis
    x3, y3 = ds[2]
    assert x3.shape[0] == 5 and (x3 == 0.0).all() and y3[0] == 1.0


def test_sample_dataset_respects_stay_subset_and_label_lookup(
    spark, mimic_dir, tmp_path
):
    dst = _build(spark, mimic_dir, tmp_path)
    labels = pd.DataFrame(index=[2, 1], data={"label": [0.25, 0.75]})
    ds = SampleDataset(labels, dst, stay_ids=[2], feature_ids=[100, 400])
    assert len(ds) == 1
    x, y = ds[0]
    # labels join is by stay_id, not positional (:81)
    assert y[0] == 0.25
    # stay 2: exact-multiple stay -> 5 buckets (floor+1 quirk, E8);
    # itemid 100 buckets 3 and 4 carry 7.0 and 8.0
    assert x.shape == (2, 5)
    assert np.allclose(x[0], [0.0, 0.0, 0.0, 7.0, 8.0])
    # itemid 400 (procedureevents): stay 2 span spread 10/3 over buckets 1-3
    assert np.allclose(x[1], [0.0, 10 / 3, 10 / 3, 10 / 3, 0.0])
