"""Time-series join operators Spark lacks natively: as-of join and
range (point-in-interval) join.

Both are expressed as compositions of existing DataFrame ops — no
Pandas UDF, no nested-loop join — so they stay inside whole-stage
codegen and scale by partitioning on the join key:

- as-of join: the classic union-merge trick. Tag build rows 0 and probe
  rows 1, union, and take ``last(value, ignorenulls=True)`` over a
  (key) window ordered by (time, side). ONE shuffle on the key, linear
  work, no time-range explosion — the plan a 1000-executor cluster
  wants. (A range-join formulation would be O(probe × build) per key;
  pandas ``merge_asof`` per group would leave the JVM.)

- range join: intervals are exploded to the fixed-width time buckets
  they cover, points land in exactly one bucket, and the match becomes
  a (key, bucket) EQUI-join plus a residual ``s <= t < e`` filter.
  Spark would otherwise plan an inequality join as
  BroadcastNestedLoopJoin — quadratic and executor-OOM at scale. With
  bucket width >= max interval length each interval lands in <= 2
  buckets, so the explode is a bounded 2x, and because a point belongs
  to exactly one bucket no pair is emitted twice (no dedup pass).

Determinism contract (oracle parity): the build side of the as-of join
must be unique per (key, time) — ties at the same instant have no
defined winner in either engine. ``asof_join`` does NOT dedup for you;
callers pre-aggregate (see harness ``q_asof_join``: max(value) per
(user, second), order-independent and exact).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    probe_ts: str,
    build_ts: str,
    value_cols: Sequence[str],
    matched_ts: str = "asof_ts",
) -> DataFrame:
    """For each probe row, attach ``value_cols`` from the most recent
    build row with the same key and ``build_ts <= probe_ts`` (backward
    as-of, inclusive), plus that row's time as ``matched_ts``.
    No match -> NULLs (left-join semantics).

    Requires: build unique per (key, build_ts); probe/build time and
    value columns distinct from each other and from ``matched_ts``.
    """
    on = list(on)
    value_cols = list(value_cols)
    probe_cols = [c for c in probe.columns if c not in on and c != probe_ts]

    b = build.select(
        *on,
        F.col(build_ts).alias("_asof_t"),
        F.lit(0).alias("_asof_side"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(dict(probe.dtypes)[c]).alias(c) for c in probe_cols],
    )
    p = probe.select(
        *on,
        F.col(probe_ts).alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
        *[F.lit(None).cast(dict(build.dtypes)[c]).alias(c) for c in value_cols],
        *[F.col(c) for c in probe_cols],
    )
    u = b.unionByName(p)

    # One window, one shuffle: partition by key, order by (t, side) so a
    # build row at exactly t sorts before probes at t (inclusive bound).
    w = (
        Window.partitionBy(*on)
        .orderBy("_asof_t", "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in value_cols],
        F.last(
            F.when(F.col("_asof_side") == 0, F.col("_asof_t")), ignorenulls=True
        )
        .over(w)
        .alias(matched_ts),
    )
    return filled.where(F.col("_asof_side") == 1).select(
        *on,
        F.col("_asof_t").alias(probe_ts),
        *probe_cols,
        *[F.col(f"_f_{c}").alias(c) for c in value_cols],
        matched_ts,
    )


def explode_interval_buckets(s: Column, e: Column, width: int) -> Column:
    """Bucket indices the half-open interval [s, e) covers at the given
    width. Empty/inverted intervals (e <= s) cover no buckets."""
    return F.when(
        e > s,
        F.sequence(F.floor(s / width), F.floor((e - F.lit(1)) / width)),
    ).otherwise(F.array().cast("array<bigint>"))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join: every (interval, point) pair with matching key and
    ``start <= t < end`` (half-open), as a (key, bucket) equi-join.

    ``bucket_width`` trades explode factor against bucket selectivity:
    pick it >= the typical interval length so each interval covers
    <= 2 buckets. Correct for any width; never emits duplicates (a
    point is in exactly one bucket).
    """
    on = list(on)
    iv = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            explode_interval_buckets(F.col(start_col), F.col(end_col), bucket_width)
        ),
    )
    pt = points.withColumn("_rj_bucket", F.floor(F.col(point_ts) / bucket_width))
    joined = pt.join(iv, on=on + ["_rj_bucket"], how="inner").where(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("_rj_bucket")


BLOOM_M = 1 << 17  # filter bits: 2048 int64 words = 16 KiB shipped in the plan
BLOOM_K = 3        # probes per key (md5 slices — deterministic, no rand())


def _bloom_positions(key: Column, m: int, k: int) -> list[Column]:
    """k bit positions per key from ONE md5: 8-hex-digit slices of the
    digest, each mod m — deterministic across retries (no rand(), no
    engine-native hash()), evaluated JVM-side in codegen."""
    hexs = F.md5(key.cast("string"))
    return [
        F.conv(F.substring(hexs, 1 + 8 * i, 8), 16, 10).cast("long") % m
        for i in range(k)
    ]


BLOOM_M_MAX = 1 << 20  # plan-literal ceiling: 16 K words = 128 KiB


def derived_bloom_m(n_dim: int) -> int:
    """Filter width derived from the dim key count (the derived-dials
    rule: fixed sketch widths saturate as the input grows — simhash
    r01, IVF cells r05). ~16 bits/key keeps the false-positive rate
    ≈ (1−e^{−3/16·…})^3 ≲ 1 %; floor 2^17, ceiling 2^20 (a plan
    literal should stay ~100 KiB — past the ceiling the prune degrades
    gracefully toward pass-through, never incorrectly)."""
    m = BLOOM_M
    while m < BLOOM_M_MAX and m < 16 * n_dim:
        m <<= 1
    return m


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    m: int | None = None,
    k: int = BLOOM_K,
) -> DataFrame:
    """Bloom-filter semi-join reduction: inner equi-join fact ⋈ dim on
    `key`, with the FACT side pruned by a Bloom filter over the dim's
    key set BEFORE the fact ever reaches the join shuffle. False
    positives survive the prune and die in the exact join, so the
    result is bit-identical to the plain join (the oracle needs no
    bloom at all); false negatives are impossible (every dim key set
    its own bits).

    This is the 100 TB star-join move when the dim is too big to
    broadcast but its KEY SET compresses to a few KiB of bits: the
    filter is built with one bounded aggregation (≤ m/64 (word, bits)
    rows via bit_or — a documented broadcast-budget choice, m/64·8
    bytes to the driver), folded into the plan as a constant int64
    array, and each fact row pays k in-register probes instead of a
    shuffle write. Catalyst pushes the probe filter below the fact's
    exchange; at 1/5 dim selectivity that is ~80 % of the fact shuffle
    gone. Spark's own runtime bloom filter (`spark.sql.optimizer.
    runtime.bloomFilter.*`) makes the same trade adaptively but is not
    SQL-addressable and fires only under planner heuristics; this
    operator is the explicit, deterministic form.

    m = None (default) DERIVES the width from the dim key count (one
    count() scalar job on the already-filtered dim — cheap next to the
    build aggregation): fixed sketch widths saturate as the input grows
    (the simhash-width rule). Keys hash through ONE md5 (k slices of
    the digest), so the probe cost is one digest + k masked compares."""
    if m is None:
        m = derived_bloom_m(dim.count())
    pos = dim.select(F.explode(F.array(*_bloom_positions(F.col(key), m, k))).alias("p"))
    words_rows = (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * (m // 64)
    for r in words_rows:
        words[r.w] = r.bits
    # constant-folded to ONE literal array in the plan (16 KiB at the
    # default m), referenced k times by the probe filter. Built as a
    # single parsed expression: m/64 individual F.lit() Columns would
    # cost one py4j round-trip EACH (~5 s of driver time at m = 2^17 —
    # measured; the whole query executes in under a second).
    wl = F.expr("array(" + ",".join(f"{w}L" for w in words) + ")")
    probed = fact.withColumn("_bf_words", wl)
    for i, p in enumerate(_bloom_positions(F.col(key), m, k)):
        probed = probed.withColumn(f"_bf_p{i}", p)
    test = " AND ".join(
        f"(element_at(_bf_words, cast(_bf_p{i} div 64 as int) + 1)"
        f" & shiftleft(1L, cast(_bf_p{i} % 64 as int))) != 0"
        for i in range(k)
    )
    pruned = probed.where(F.expr(test)).drop(
        "_bf_words", *[f"_bf_p{i}" for i in range(k)]
    )
    return pruned.join(dim, key)
