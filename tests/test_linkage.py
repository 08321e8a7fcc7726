"""Record linkage (operators/linkage.py): the deletion-neighborhood
blocking must be COMPLETE for levenshtein <= 1 on arbitrary strings —
a blocking hole would silently drop true matches, and the registry
oracle (naive all-pairs) is the only other net. Property-tests drive
the REAL Spark expression, not a Python re-derivation (CLAUDE.md
round-3 rule)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mimic2ts_spark.operators.linkage import (
    best_match_report,
    deletion_variants,
    fuzzy_link,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ALPHA = "ab#1"  # tiny alphabet → frequent collisions and repeats


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


@st.composite
def _edited_pair(draw):
    """(a, b) with lev(a, b) <= 1 by construction: substitute, insert,
    delete, or keep."""
    a = draw(st.text(alphabet=_ALPHA, min_size=1, max_size=8))
    op = draw(st.sampled_from(["sub", "ins", "del", "keep"]))
    i = draw(st.integers(min_value=0, max_value=max(len(a) - 1, 0)))
    ch = draw(st.sampled_from(_ALPHA))
    if op == "sub":
        b = a[:i] + ch + a[i + 1 :]
    elif op == "ins":
        b = a[:i] + ch + a[i:]
    elif op == "del":
        b = a[:i] + a[i + 1 :]
    else:
        b = a
    return a, b


@given(pairs=st.lists(_edited_pair(), min_size=1, max_size=12))
@settings(**_SETTINGS)
def test_blocking_complete_for_lev1(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(
        "a",
        "b",
        F.arrays_overlap(
            deletion_variants("a"), deletion_variants("b")
        ).alias("blocked"),
    ).collect()
    for r in rows:
        assert _lev(r.a, r.b) <= 1
        assert r.blocked, (r.a, r.b)


def test_fuzzy_link_matches_naive(spark):
    dirty = [("d1", "widget"), ("d2", "wigdet"), ("d3", "zzzz"), ("d4", "")]
    clean = [("c1", "widget"), ("c2", "widgets"), ("c3", "midget"), ("c4", "")]
    got = {
        (r.dirty_key, r.clean_key): r.dist
        for r in fuzzy_link(
            spark.createDataFrame(dirty, "id string, name string"),
            spark.createDataFrame(clean, "id string, name string"),
            dirty_key="id",
            clean_key="id",
            dirty_col="name",
            clean_col="name",
        ).collect()
    }
    want = {
        (di, ci): _lev(dn, cn)
        for di, dn in dirty
        for ci, cn in clean
        if _lev(dn, cn) <= 1
    }
    assert got == want
    # "wigdet" is a transposition = lev 2 from "widget": correctly absent
    assert ("d2", "c1") not in got


def test_best_match_deterministic_tiebreak(spark):
    pairs = spark.createDataFrame(
        [("d", 7, 1), ("d", 3, 1), ("d", 9, 0)],
        "dirty_key string, clean_key int, dist int",
    )
    row = best_match_report(pairs).collect()[0]
    assert row.best_clean_key == 9 and row.best_dist == 0 and row.n_cand == 3


def test_max_dist_above_blocking_depth_rejected(spark):
    df = spark.createDataFrame([("a", "x")], "id string, name string")
    with pytest.raises(ValueError):
        fuzzy_link(
            df, df, dirty_key="id", clean_key="id",
            dirty_col="name", clean_col="name", max_dist=2,
        )
