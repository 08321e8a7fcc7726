"""Explicit StructType schemas for every source table.

The reference declares one shared dtype dict applied to all CSV scans
(/root/reference/src/mimic2ts/__init__.py:12-46) and lets the engine infer
the rest. We declare one explicit schema per table instead — explicit
schemas skip the inference scan entirely (at 100 TB an inference pass is a
full extra read) and give Catalyst exact column types for pruning and
pushdown.

Type mapping (SURVEY.md §1.2): ids → LongType, measures → DoubleType,
timestamps-as-text → StringType at scan (parsed to epoch seconds by
operators.time_ops), free text → StringType.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# --- MIMIC-shaped sources (FIXTURES.md §1-6) -------------------------------

ICUSTAYS = _st(
    ("subject_id", T.LongType()),
    ("hadm_id", T.LongType()),
    ("stay_id", T.LongType()),
    ("intime", T.StringType()),
    ("outtime", T.StringType()),
)

D_ITEMS = _st(
    ("itemid", T.LongType()),
    ("label", T.StringType()),
)

CHARTEVENTS = _st(
    ("subject_id", T.LongType()),
    ("hadm_id", T.LongType()),
    ("stay_id", T.LongType()),
    ("charttime", T.StringType()),
    ("storetime", T.StringType()),
    ("itemid", T.LongType()),
    ("value", T.StringType()),
    ("valuenum", T.DoubleType()),
    ("valueuom", T.StringType()),
    ("warning", T.StringType()),
)

INPUTEVENTS = _st(
    ("subject_id", T.LongType()),
    ("hadm_id", T.LongType()),
    ("stay_id", T.LongType()),
    ("starttime", T.StringType()),
    ("endtime", T.StringType()),
    ("itemid", T.LongType()),
    ("amount", T.DoubleType()),
    ("amountuom", T.StringType()),
    ("rate", T.DoubleType()),
    ("rateuom", T.StringType()),
    ("orderid", T.LongType()),
    ("linkorderid", T.LongType()),
    ("ordercategoryname", T.StringType()),
    ("secondaryordercategoryname", T.StringType()),
    ("ordercomponenttypedescription", T.StringType()),
    ("ordercategorydescription", T.StringType()),
    ("patientweight", T.DoubleType()),
    ("totalamount", T.DoubleType()),
    ("totalamountuom", T.StringType()),
    ("isopenbag", T.LongType()),
    ("continueinnextdept", T.LongType()),
    ("cancelreason", T.LongType()),
    ("statusdescription", T.StringType()),
    ("originalamount", T.DoubleType()),
    ("originalrate", T.DoubleType()),
)

OUTPUTEVENTS = _st(
    ("subject_id", T.LongType()),
    ("hadm_id", T.LongType()),
    ("stay_id", T.LongType()),
    ("charttime", T.StringType()),
    ("storetime", T.StringType()),
    ("itemid", T.LongType()),
    ("value", T.DoubleType()),
    ("valueuom", T.StringType()),
)

PROCEDUREEVENTS = _st(
    ("subject_id", T.LongType()),
    ("hadm_id", T.LongType()),
    ("stay_id", T.LongType()),
    ("starttime", T.StringType()),
    ("endtime", T.StringType()),
    ("itemid", T.LongType()),
    ("value", T.DoubleType()),
    ("valueuom", T.StringType()),
    ("statusdescription", T.StringType()),
)

# Engine-internal long form (SURVEY.md §1.3): the single fixed schema every
# source pipeline produces. Wide matrices exist only at the sink.
LONG_FORM = _st(
    ("stay_id", T.LongType()),
    ("feature_id", T.LongType()),
    ("tidx", T.LongType()),
    ("value", T.DoubleType()),
)

TIMESTAMP_FMT = "yyyy-MM-dd HH:mm:ss"  # reference: "%Y-%m-%d %H:%M:%S"
