"""Per-operator unit tests, pinning the semantic quirks from SURVEY.md §2:
range-vs-sequence inclusivity (I1), floor bucketing of negatives (E6),
clamp (E7), floor total_windows (E8), dense reindex + ffill ordering
(J2/W1/W2)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mimic2ts_spark.operators import (
    bucket_index,
    clamp_floor,
    dense_reindex,
    forward_fill,
    interval_instants,
    parse_epoch_seconds,
    pivot_wide,
    spread_evenly,
    total_windows,
    zero_fill,
)

H = 3600


@pytest.mark.parametrize(
    "start,end,step",
    [
        (0, 7200, 3600),      # exact multiple
        (0, 7300, 3600),      # overshoot
        (0, 0, 3600),         # zero-length → one element
        (1800, 9000, 3600),   # exact multiple, offset
        (5, 13, 7),           # tiny odd steps
        (5, 12, 7),           # end-start = step exactly
        (5, 5 + 7, 7),
        (100, 100 + 6, 7),    # d < step
    ],
)
def test_interval_instants_matches_python_range(spark, start, end, step):
    """I1: sequence(start, end+step-1, step) == list(range(start, end+step, step))
    (/root/reference/src/mimic2ts/__init__.py:319-327)."""
    expected = list(range(start, end + step, step))
    row = (
        spark.range(1)
        .select(
            interval_instants(F.lit(start).cast("long"), F.lit(end).cast("long"), step).alias("xs")
        )
        .first()
    )
    assert row.xs == expected


def test_bucket_index_floors_negatives(spark):
    """E6: events before intime get negative buckets via floor (not trunc)."""
    df = spark.createDataFrame(
        [(-1, 0), (-3600, 0), (-3601, 0), (0, 0), (3599, 0), (3600, 0)],
        "ev long, intime long",
    )
    out = df.select(bucket_index(F.col("ev"), F.col("intime"), H).alias("t")).collect()
    assert [r.t for r in out] == [-1, -1, -2, 0, 0, 1]


def test_clamp_floor(spark):
    df = spark.createDataFrame([(-5,), (0,), (3,)], "t long")
    out = df.select(clamp_floor(F.col("t")).alias("t")).collect()
    assert [r.t for r in out] == [0, 0, 3]


def test_total_windows_floor_quirk(spark):
    """E8: floor, so an exact-multiple stay has floor(x)+1 buckets
    (one more than ceil) — /root/reference/src/mimic2ts/__init__.py:93-95."""
    df = spark.createDataFrame([(0, 5 * H + 1800), (0, 4 * H)], "i long, o long")
    out = df.select(total_windows(F.col("o"), F.col("i"), H).alias("w")).collect()
    assert [r.w for r in out] == [5, 4]


def test_parse_epoch_seconds(spark):
    df = spark.createDataFrame([("2024-01-01 00:00:07",)], "s string")
    assert df.select(parse_epoch_seconds("s").alias("e")).first().e == 1704067207


def test_spread_evenly(spark):
    df = spark.range(1).select(
        F.lit(6.0).alias("v"),
        F.array(F.lit(1), F.lit(2), F.lit(3)).alias("xs"),
    )
    assert df.select(spread_evenly(F.col("v"), F.col("xs")).alias("o")).first().o == 2.0


def _sparse(spark):
    # stay 1 / feature 9, total_windows=4, observed tidx {1, 3}
    return spark.createDataFrame(
        [(1, 9, 4, 1, 10.0), (1, 9, 4, 3, 30.0)],
        "stay_id long, feature_id long, total_windows long, tidx long, value double",
    )


def test_dense_reindex_zero_fill(spark):
    out = zero_fill(dense_reindex(_sparse(spark)))
    got = {r.tidx: r.value for r in out.collect()}
    assert got == {0: 0.0, 1: 10.0, 2: 0.0, 3: 30.0, 4: 0.0}


def test_dense_reindex_ffill_then_zero(spark):
    """W1 then W2: ffill carries last observation; leading gap → 0.0
    (/root/reference/src/mimic2ts/__init__.py:128-132)."""
    out = zero_fill(forward_fill(dense_reindex(_sparse(spark))))
    got = {r.tidx: r.value for r in out.collect()}
    assert got == {0: 0.0, 1: 10.0, 2: 10.0, 3: 30.0, 4: 30.0}


def test_pivot_wide(spark):
    df = spark.createDataFrame(
        [(1, 9, 0, 1.0), (1, 9, 1, 2.0), (1, 8, 0, 3.0), (1, 8, 1, 4.0)],
        "stay_id long, feature_id long, tidx long, value double",
    )
    wide = pivot_wide(df, pivot_values=[0, 1]).toPandas().set_index("feature_id").sort_index()
    assert list(wide.columns) == ["stay_id", "0", "1"]
    assert wide.loc[8, "0"] == 3.0 and wide.loc[9, "1"] == 2.0


# --- time-series joins (operators/joins.py) --------------------------------


def test_asof_join_semantics(spark):
    """Backward inclusive as-of: equal timestamps match; earlier build
    rows are shadowed by later ones; no prior build row -> NULLs."""
    from mimic2ts_spark.operators.joins import asof_join

    build = spark.createDataFrame(
        [(1, 10, 100.0), (1, 20, 200.0), (2, 15, 900.0)], "k int, bt int, v double"
    )
    probe = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 19, "c"), (1, 25, "d"), (2, 14, "e"), (3, 99, "f")],
        "k int, pt int, tag string",
    )
    out = asof_join(probe, build, on=["k"], probe_ts="pt", build_ts="bt",
                    value_cols=["v"], matched_ts="mt")
    rows = {(r.k, r.pt): (r.v, r.mt) for r in out.collect()}
    assert rows == {
        (1, 5): (None, None),      # before any build row
        (1, 10): (100.0, 10),      # tie at t: inclusive
        (1, 19): (100.0, 10),
        (1, 25): (200.0, 20),      # later build shadows earlier
        (2, 14): (None, None),
        (3, 99): (None, None),     # key absent from build
    }
    assert out.count() == probe.count()  # left-join row preservation


def test_range_join_half_open_and_bucket_edges(spark):
    """Half-open [s, e): point at s matches, at e doesn't; intervals
    spanning a bucket edge still match exactly once; empty interval
    (e <= s) matches nothing."""
    from mimic2ts_spark.operators.joins import range_join

    intervals = spark.createDataFrame(
        [(1, 100, 0, 10), (1, 101, 8, 25), (1, 102, 30, 30), (2, 103, 0, 100)],
        "k int, iid int, s int, e int",
    )
    points = spark.createDataFrame(
        [(1, 0), (1, 9), (1, 10), (1, 24), (1, 25), (1, 30), (2, 99), (2, 100)],
        "k int, t int",
    )
    out = range_join(points, intervals, on=["k"], point_ts="t",
                     start_col="s", end_col="e", bucket_width=10)
    pairs = sorted((r.iid, r.t) for r in out.collect())
    assert pairs == [
        (100, 0), (100, 9),          # 10 excluded (half-open)
        (101, 9), (101, 10), (101, 24),  # 8<=t<25 across 3 buckets, once each
        (103, 99),                   # 100 excluded
    ]
    assert "_rj_bucket" not in out.columns


def test_kmv_sketch_exact_below_k_and_estimates_above(spark):
    """Below k the sketch is exact; above k the KMV estimate lands
    within ~3/sqrt(k) relative error (here ~2x margin on one draw)."""
    from mimic2ts_spark.operators.sketch import kmv_sketch

    rows = [("small", i) for i in range(10)] + [("big", i) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in kmv_sketch(df, ["g"], "v", k=64).collect()}
    assert out["small"].n_kept == 10
    assert out["small"].est_distinct == 10.0
    assert out["big"].n_kept == 64
    assert abs(out["big"].est_distinct - 5000) / 5000 < 0.75
    # duplicates must not perturb the sketch (distinct semantics)
    df2 = spark.createDataFrame(rows + rows, "g string, v long")
    out2 = {r.g: r for r in kmv_sketch(df2, ["g"], "v", k=64).collect()}
    assert out2["big"].kth_code == out["big"].kth_code


def test_cms_upper_bound_and_heavy_hitter_completeness(spark):
    """CMS never undercounts (each of the d counters includes every
    occurrence of the value; min preserves that), its state is bounded
    by d*w rows each summing to N, and — because the heavy-hitter
    filter runs on the ESTIMATE side — no true heavy hitter can be
    missed even under a collision-heavy tiny width."""
    from mimic2ts_spark.operators.sketch import (
        CMS_DEPTH,
        cms_counters,
        cms_estimate,
        cms_width,
    )

    # skewed multiset: t_i appears i times, plus one dominant token
    rows = [(f"t{i}",) for i in range(1, 50) for _ in range(i)] + [("hot",)] * 500
    n_total = len(rows)
    df = spark.createDataFrame(rows, "tok string")
    cand = df.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("exact_cnt")
    )

    w = cms_width(50)
    cdf = cms_counters(df, "tok", w).collect()
    assert len(cdf) <= CMS_DEPTH * w
    per_j: dict = {}
    for r in cdf:
        per_j[r.j] = per_j.get(r.j, 0) + r.cnt
    assert set(per_j) == set(range(CMS_DEPTH))  # every hash row present
    assert all(v == n_total for v in per_j.values())  # mass conservation

    counters = cms_counters(df, "tok", w)
    est = {r.tok: r for r in cms_estimate(cand, "tok", counters, w).collect()}
    assert set(est) == {f"t{i}" for i in range(1, 50)} | {"hot"}
    assert all(r.cms_est >= r.exact_cnt for r in est.values())

    # tiny width forces collisions: still an upper bound everywhere,
    # and the est-side support filter keeps every true heavy hitter
    w2 = 8
    counters2 = cms_counters(df, "tok", w2)
    est2 = {r.tok: r for r in cms_estimate(cand, "tok", counters2, w2).collect()}
    assert all(r.cms_est >= r.exact_cnt for r in est2.values())
    assert any(r.cms_est > r.exact_cnt for r in est2.values())  # collisions real
    flagged = {t for t, r in est2.items() if 200 * r.cms_est >= n_total}
    true_heavy = {t for t, r in est2.items() if 200 * r.exact_cnt >= n_total}
    assert true_heavy and true_heavy <= flagged

    # UNSEEN candidates (never sketched) must still get a well-defined
    # estimate: an empty bucket proves frequency 0 for that hash row, so
    # the d-way min is 0 unless EVERY row collides with sketched mass —
    # never a dropped row/candidate (the r06 advice: inner-joining
    # counters could return an estimate above the true min, or nothing).
    unseen = spark.createDataFrame(
        [(f"unseen{i}",) for i in range(16)], "tok string"
    ).withColumn("exact_cnt", F.lit(0).cast("long"))
    est_u = {r.tok: r.cms_est for r in cms_estimate(unseen, "tok", counters, w).collect()}
    assert set(est_u) == {f"unseen{i}" for i in range(16)}  # none dropped
    assert all(v >= 0 for v in est_u.values())
    # at width >= 4*vocab most unseen values hit at least one empty row
    assert any(v == 0 for v in est_u.values())


def test_connected_components_vs_union_find(spark):
    """Chains force the pointer-jumping path (neighbor propagation
    alone needs O(length) rounds); the cross-check oracle is a plain
    Python union-find over the same edges."""
    from mimic2ts_spark.operators.cluster import canonical_ids, connected_components

    edges = (
        [(i, i + 1) for i in range(1, 40)]        # one long chain 1..40
        + [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]  # clique
        + [(200, 201), (203, 202), (201, 203)]    # mixed direction
        + [(300, 300)]                            # self-loop only → dropped
    )
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.node: r.comp for r in connected_components(e).collect()}

    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    # re-run find to full compression
    want = {n: find(n) for n in parent}
    assert got == want
    assert 300 not in got  # self-loop-only node has no edges

    docs = spark.createDataFrame([(i,) for i in [1, 5, 40, 104, 500]], "doc_id long")
    canon = {r.doc_id: r.cluster_id for r in canonical_ids(docs, e).collect()}
    assert canon == {1: 1, 5: 1, 40: 1, 104: 100, 500: 500}
