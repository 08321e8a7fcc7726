"""Shared fixtures: one SparkSession per test session + synthetic
MIMIC-shaped CSVs encoding every FIXTURES.md §8 edge case.

The reference's own tests need unshipped real MIMIC data
(/root/reference/tests/test_EventsAggregator.py:23-27); these synthetic
fixtures are hand-computed so results can be asserted exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest

from mimic2ts_spark.session import get_spark

H = 3600  # default timestep


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mimic2ts_spark_tests", shuffle_partitions=4)
    yield s


def _csv(df_dict: dict, path) -> None:
    pd.DataFrame(df_dict).to_csv(path, index=False)


@pytest.fixture(scope="session")
def mimic_dir(tmp_path_factory) -> str:
    """Synthetic MIMIC root with icu/*.csv.

    Stays:
      1: in 2024-01-01 00:00:00, out 05:30:00 → total_windows=5 (6 buckets)
      2: in 2024-01-02 00:00:00, out 04:00:00 → EXACT multiple,
         total_windows=4 (5 buckets — floor+1 quirk, SURVEY.md §2.3)
      3: in 2024-01-03 00:00:00, out 02:30:00 → NO events anywhere (S4)
    """
    root = tmp_path_factory.mktemp("mimic")
    icu = root / "icu"
    icu.mkdir()

    _csv(
        {
            "subject_id": [11, 12, 13],
            "hadm_id": [21, 22, 23],
            "stay_id": [1, 2, 3],
            "intime": ["2024-01-01 00:00:00", "2024-01-02 00:00:00", "2024-01-03 00:00:00"],
            "outtime": ["2024-01-01 05:30:00", "2024-01-02 04:00:00", "2024-01-03 02:30:00"],
        },
        icu / "icustays.csv",
    )
    _csv(
        {"itemid": [100, 101, 200, 300, 400], "label": ["hr", "note", "drug", "urine", "vent"]},
        icu / "d_items.csv",
    )

    # chartevents (bucket-MEAN). stay 1, itemid 100:
    #   00:30 v=10, 00:45 v=20  → bucket 0
    #   2023-12-31 23:00 v=50   → EARLY, clamps to bucket 0 → mean(10,20,50)=80/3
    #   02:10 v=30              → bucket 2
    #   06:30 v=99              → LATE (tidx 6 > 5) dropped
    # stay 1, itemid 101: null valuenum at 01:00 (text event)
    # stay 2, itemid 100: 03:59:59 v=7 → bucket 3; 04:00:00 v=8 → bucket 4
    #   (exact-multiple stay: bucket 4 EXISTS because width = floor+1)
    _csv(
        {
            "subject_id": [11] * 5 + [11, 12, 12],
            "hadm_id": [21] * 5 + [21, 22, 22],
            "stay_id": [1, 1, 1, 1, 1, 1, 2, 2],
            "charttime": [
                "2024-01-01 00:30:00",
                "2024-01-01 00:45:00",
                "2023-12-31 23:00:00",
                "2024-01-01 02:10:00",
                "2024-01-01 06:30:00",
                "2024-01-01 01:00:00",
                "2024-01-02 03:59:59",
                "2024-01-02 04:00:00",
            ],
            "storetime": ["2024-01-01 00:30:00"] * 8,
            "itemid": [100, 100, 100, 100, 100, 101, 100, 100],
            "value": [""] * 8,
            "valuenum": [10.0, 20.0, 50.0, 30.0, 99.0, None, 7.0, 8.0],
            "valueuom": ["bpm"] * 8,
            "warning": [""] * 8,
        },
        icu / "chartevents.csv",
    )

    # inputevents (spread + bucket-SUM, weight-normalized). stay 1, itemid 200:
    #   00:30→02:30 amount=60 w=10 → value 6 over instants [1800,5400,9000]
    #       → 2.0 into buckets 0,1,2
    #   01:00→01:00 amount=5 w=5 (ZERO-LENGTH) → 1.0 into bucket 1
    #   00:00→02:00 amount=9 w=1  (EXACT multiple) → instants [0,3600,7200]
    #       → 3.0 into buckets 0,1,2
    base = {
        "subject_id": [11, 11, 11],
        "hadm_id": [21, 21, 21],
        "stay_id": [1, 1, 1],
        "starttime": ["2024-01-01 00:30:00", "2024-01-01 01:00:00", "2024-01-01 00:00:00"],
        "endtime": ["2024-01-01 02:30:00", "2024-01-01 01:00:00", "2024-01-01 02:00:00"],
        "itemid": [200, 200, 200],
        "amount": [60.0, 5.0, 9.0],
        "amountuom": ["mg"] * 3,
        "rate": [None] * 3,
        "rateuom": [""] * 3,
        "orderid": [1, 2, 3],
        "linkorderid": [1, 2, 3],
        "ordercategoryname": [""] * 3,
        "secondaryordercategoryname": [""] * 3,
        "ordercomponenttypedescription": [""] * 3,
        "ordercategorydescription": [""] * 3,
        "patientweight": [10.0, 5.0, 1.0],
        "totalamount": [None] * 3,
        "totalamountuom": [""] * 3,
        "isopenbag": [0] * 3,
        "continueinnextdept": [0] * 3,
        "cancelreason": [0] * 3,
        "statusdescription": ["FinishedRunning"] * 3,
        "originalamount": [None] * 3,
        "originalrate": [None] * 3,
    }
    _csv(base, icu / "inputevents.csv")

    # outputevents (bucket-SUM). stay 1, itemid 300: 00:10 v=100, 00:20 v=50
    # (bucket 0 sum 150), 03:30 v=25 (bucket 3).
    _csv(
        {
            "subject_id": [11, 11, 11],
            "hadm_id": [21, 21, 21],
            "stay_id": [1, 1, 1],
            "charttime": ["2024-01-01 00:10:00", "2024-01-01 00:20:00", "2024-01-01 03:30:00"],
            "storetime": ["2024-01-01 00:30:00"] * 3,
            "itemid": [300, 300, 300],
            "value": [100.0, 50.0, 25.0],
            "valueuom": ["ml"] * 3,
        },
        icu / "outputevents.csv",
    )

    # procedureevents (spread + bucket-SUM, no weight-norm). stay 2,
    # itemid 400: 01:30→03:30 value=10 → instants [5400,9000,12600] →
    # 10/3 into buckets 1,2,3.
    _csv(
        {
            "subject_id": [12],
            "hadm_id": [22],
            "stay_id": [2],
            "starttime": ["2024-01-02 01:30:00"],
            "endtime": ["2024-01-02 03:30:00"],
            "itemid": [400],
            "value": [10.0],
            "valueuom": ["min"],
            "statusdescription": ["FinishedRunning"],
        },
        icu / "procedureevents.csv",
    )

    return str(root)
