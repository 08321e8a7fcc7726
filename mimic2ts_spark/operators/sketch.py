"""KMV (k-minimum-values) distinct-count sketch — a mergeable
cardinality estimator with a BIT-EXACT cross-engine contract.

Why KMV and not HyperLogLog here: the estimate must hash-match a DuckDB
oracle, so every arithmetic step has to be reproducible from SQL.
KMV's state is just "the k smallest md5-derived codes" — pure integer
ops plus ONE division at the end — whereas HLL's register updates and
harmonic-mean bias correction depend on engine-internal hashing and
float summation order. Same O(k) state, same mergeability (union =
min-k of the union of code sets), none of the nondeterminism.

Scale shape (100 TB): three narrowing shuffles —
1. distinct (group, code): hash-aggregate with map-side partial dedup,
   the only pass that sees raw volume;
2. salted pre-top-k: row_number over (group, code % SALT_BUCKETS)
   keeps k per salt bucket, so no single task ever sorts a whole
   group's distinct set (a billion-distinct group splits into
   SALT_BUCKETS ordered scans of its shards);
3. final top-k over (group): at most SALT_BUCKETS*k rows per group —
   thousands, regardless of input size.

Estimator: with codes uniform on [0, 2^60), the k-th smallest value
U_k satisfies E[U_k / 2^60] = k / (D + 1), giving the classic
est = (k - 1) / (U_k / 2^60). When fewer than k distinct values exist
the sketch is exact (est = n_kept).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mimic2ts_spark.operators.text import SQL_CODE

KMV_K = 64
SALT_BUCKETS = 32
CODE_SPACE = float(1 << 60)  # md5 prefix is 15 hex chars = 60 bits


def kmv_code(col: Column) -> Column:
    """Deterministic 60-bit uniform code (md5-derived; engine-portable —
    see text.token_code / CLAUDE.md cross-engine hashing rule)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = KMV_K,
    salt_buckets: int = SALT_BUCKETS,
) -> DataFrame:
    """Per-group KMV sketch of distinct ``value_col``: (n_kept,
    kth_code, est_distinct). est_distinct is exact below k."""
    group_cols = list(group_cols)
    codes = df.select(
        *group_cols, kmv_code(F.col(value_col)).alias("_code")
    ).distinct()

    w_salt = Window.partitionBy(
        *group_cols, (F.col("_code") % salt_buckets).alias("_salt")
    ).orderBy("_code")
    pre = (
        codes.withColumn("_rn", F.row_number().over(w_salt))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )

    w_group = Window.partitionBy(*group_cols).orderBy("_code")
    topk = pre.withColumn("_rn", F.row_number().over(w_group)).where(
        F.col("_rn") <= k
    )

    agg = topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_code").alias("kth_code"),
    )
    # One division chain, identical op order in the SQL oracle.
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("kth_code").cast("double") / F.lit(CODE_SPACE))
    )
    return agg.select(*group_cols, "n_kept", "kth_code", est.alias("est_distinct"))


def kmv_sketch_sql(
    table: str, group_col: str, value_col: str, k: int = KMV_K
) -> str:
    """DuckDB oracle mirroring kmv_sketch exactly (the salted pre-pass is
    a superset filter, so the plain row_number form is equivalent)."""
    code = SQL_CODE.format(tok=f"CAST({value_col} AS VARCHAR)")
    return f"""
WITH codes AS (
    SELECT DISTINCT {group_col}, {code} AS code FROM {table}
),
ranked AS (
    SELECT {group_col}, code,
           row_number() OVER (PARTITION BY {group_col} ORDER BY code) AS rn
    FROM codes
)
SELECT {group_col},
       CAST(count(*) AS BIGINT) AS n_kept,
       max(code) AS kth_code,
       CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
            ELSE {float(k - 1)} / (CAST(max(code) AS DOUBLE) / {CODE_SPACE})
       END AS est_distinct
FROM ranked WHERE rn <= {k}
GROUP BY {group_col}
"""


def kmv_topk_rows(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """The KMV sketch STATE as rows: the k smallest distinct codes per
    group — the mergeable representation (what executors would ship to
    a coordinator). Same salted pre-top-k as kmv_sketch."""
    group_cols = list(group_cols)
    codes = df.select(
        *group_cols, kmv_code(F.col(value_col)).alias("_code")
    ).distinct()
    w_salt = Window.partitionBy(
        *group_cols, (F.col("_code") % SALT_BUCKETS).alias("_salt")
    ).orderBy("_code")
    pre = (
        codes.withColumn("_rn", F.row_number().over(w_salt))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    w_group = Window.partitionBy(*group_cols).orderBy("_code")
    return (
        pre.withColumn("_rn", F.row_number().over(w_group))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge(
    state: DataFrame,
    merge_to: Sequence[str],
    k: int = KMV_K,
) -> DataFrame:
    """Merge KMV sketch states to a coarser grouping WITHOUT touching
    the raw data — the defining sketch property. EXACT merge: the k
    smallest codes of a union are each among the k smallest of their
    own part, so re-ranking the unioned states reproduces the sketch
    that a from-scratch pass over the union would build (bit-equal
    estimate; pinned by the oracle which computes from scratch)."""
    merge_to = list(merge_to)
    dedup = state.select(*merge_to, "_code").distinct()
    w = Window.partitionBy(*merge_to).orderBy("_code")
    topk = dedup.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    agg = topk.groupBy(*merge_to).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("_code").alias("kth_code"),
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("kth_code").cast("double") / F.lit(CODE_SPACE))
    )
    return agg.select(*merge_to, "n_kept", "kth_code", est.alias("est_distinct"))


# --- Count-Min frequency sketch --------------------------------------------
#
# The frequency-side companion to KMV (distinct-side): d salted hash rows
# x w counters, est(v) = min_j counter[j][h_j(v)] — the classic CMS upper
# bound. Same bit-exact contract: md5-derived bucket hashes, pure integer
# counters, no floats anywhere, so a DuckDB oracle reproduces every
# estimate exactly.
#
# Scale shape (100 TB): the counter table is d*w rows REGARDLESS of input
# size — one posexplode (d rows per value) into a map-side-combining hash
# aggregate is the only pass that sees raw volume. Estimation joins
# candidates against the d*w counter rows on (j, bucket): vocab-bound work.

CMS_DEPTH = 4
CMS_MIN_WIDTH = 1024
CMS_WIDTH_FACTOR = 4


def cms_width(n_distinct: int) -> int:
    """Counter width derived from key cardinality (fixed widths saturate
    as the corpus grows — the bloom/simhash width lesson): w =
    max(1024, 4*n_distinct) keeps expected bucket collisions < 1/4 at
    any scale. Pure integer rule (no pow2/log2 float boundary risk) so
    the SQL mirror GREATEST(1024, 4 * count(DISTINCT ...)) is exact."""
    return max(CMS_MIN_WIDTH, CMS_WIDTH_FACTOR * int(n_distinct))


def cms_buckets(col: Column, width: int, depth: int = CMS_DEPTH) -> Column:
    """Array of the `depth` bucket indexes for one value: row j hashes
    md5('j:' || value) — salted md5 gives independent-enough rows and
    stays engine-portable (cross-engine hashing rule)."""
    return F.array(
        *[
            kmv_code(F.concat(F.lit(f"{j}:"), col.cast("string"))) % F.lit(width)
            for j in range(depth)
        ]
    )


def cms_counters(
    df: DataFrame, value_col: str, width: int, depth: int = CMS_DEPTH
) -> DataFrame:
    """The d x w counter table as rows (j, bucket, cnt) in ONE pass:
    posexplode of the per-value bucket array (d*N generated rows) into a
    hash aggregate with map-side partials. No shuffle sees more than the
    aggregate's partial output."""
    probes = df.select(
        F.posexplode(cms_buckets(F.col(value_col), width, depth)).alias(
            "j", "bucket"
        )
    )
    return probes.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_estimate(
    cand: DataFrame,
    value_col: str,
    counters: DataFrame,
    width: int,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Point estimates for candidate values: est = min_j
    counter[j][h_j(v)]. The join is LEFT with missing counters coalesced
    to 0: an absent (j, bucket) row PROVES nothing hashed there, so 0 is
    the exact counter value — an inner join would silently drop that j
    from the d-way min (or the whole candidate) and could violate the
    CMS upper-bound / zero-for-unseen contract for candidates that never
    occurred in the sketched data. All candidate columns are carried
    through; the counter side stays the shuffle-joined d·w table."""
    carry = list(cand.columns)
    probes = cand.select(
        *carry,
        F.posexplode(cms_buckets(F.col(value_col), width, depth)).alias(
            "j", "bucket"
        ),
    )
    return (
        probes.join(counters, ["j", "bucket"], "left")
        .withColumn("cnt", F.coalesce("cnt", F.lit(0).cast("long")))
        .groupBy(*carry)
        .agg(F.min("cnt").alias("cms_est"))
    )


# --- HyperLogLog distinct sketch -------------------------------------------
#
# The register-max companion to KMV: CONSTANT O(m) state per group with
# ~1.04/sqrt(m) relative error regardless of cardinality, merged by
# elementwise register max (KMV merges by re-ranking k values; CMS by
# adding counters — three distinct mergeable algebras). The module
# docstring's original objection to HLL (engine-internal hashing + float
# summation order) is solved the same way as everything else here:
# md5-derived 60-bit codes, INTEGER registers via bin()-string msb
# positions (both engines render integers binary without leading
# zeros), an int64-scaled harmonic-mean denominator
# z53 = sum_j 2^(53 - M_j) (absent register ⇒ M_j = 0 ⇒ 2^53), and ONE
# pinned-order double expression at the very end. Every float input is
# an exact int64 cast, so the estimate is bit-reproducible from SQL.
#
# Scale shape (100 TB): one raw pass into a map-side-combining max
# aggregate (the partial state is ≤ m rows per group per task); the
# register table is ≤ m rows per group FOREVER, and merges touch only
# register tables. m is fixed by the error target, not the corpus (the
# width-derivation lesson does NOT apply: HLL error is cardinality-free).

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers → ~6.5% relative error
HLL_REM_BITS = 60 - HLL_P  # rho field of the 60-bit md5 code
HLL_RHO_MAX = HLL_REM_BITS + 1  # rho when the whole field is zero
# alpha_m * m^2 as an exact rational: alpha_m = 0.7213/(1 + 1.079/m)
HLL_ALPHA_NUM = 7213 * HLL_M**3  # 121014059008 < 2^53: double-exact
HLL_ALPHA_DEN = 10 * (1000 * HLL_M + 1079)
HLL_LC_BOUND = 5 * HLL_M // 2  # raw <= 2.5m → small-range correction

# Small-range (linear counting) correction: for E_raw <= 2.5m with V > 0
# empty registers, the published estimator is m*ln(m/V). ln is NOT
# bit-safe cross-engine — but V is an integer in [1, m], so the whole
# correction is a 256-entry LOOKUP of m*ln(m/V) values computed ONCE
# here and embedded as identical `<digits>e0` TEXT literals in the Spark
# expression and the DuckDB SQL (exponent literals parse as DOUBLE in
# both engines; both strtod round-trips of repr() yield the same bits).
import math  # noqa: E402

_HLL_LC_LIST = ", ".join(
    repr(HLL_M * math.log(HLL_M / v)) + "e0" for v in range(1, HLL_M + 1)
)


def hll_registers(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Per-group HLL register table (idx, reg): the ONLY pass that sees
    raw volume — select + hash-aggregate max with map-side partials.
    idx = low HLL_P bits of the md5 code, rho = leading zeros of the
    remaining HLL_REM_BITS-bit field + 1 (via msb position =
    length(bin(val)), integer-exact cross-engine)."""
    group_cols = list(group_cols)
    code = kmv_code(F.col(value_col))
    idx = code.bitwiseAND(F.lit(HLL_M - 1))
    val = F.shiftright(code, HLL_P)
    rho = F.when(val == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.bin(val))
    )
    return (
        df.select(*group_cols, idx.alias("idx"), rho.cast("long").alias("rho"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(state: DataFrame, merge_to: Sequence[str]) -> DataFrame:
    """Merge register tables to a coarser grouping WITHOUT touching raw
    data: elementwise max per idx. EXACT merge — max is associative and
    idempotent, so the merged table bit-equals the from-scratch sketch
    over the unioned inputs (the oracle computes from scratch)."""
    return state.groupBy(*list(merge_to), "idx").agg(
        F.max("reg").alias("reg")
    )


def hll_estimate(registers: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """(n_regs, z53, est_raw, est_hll) per group. z53 = sum_present
    2^(53-reg) + (m - n_present)*2^53 — pure int64 (max 256*2^53 =
    2^61). The classic raw estimate alpha_m*m^2/Z with Z = z53/2^53 is
    one fixed-order double chain ((alpha_num * 2^53) / alpha_den) /
    z53; every operand is a double-exact literal or a deterministic
    int64→double cast, so both engines produce identical bits. est_hll
    applies the published small-range correction (raw <= 2.5m and
    V = m - n_regs > 0 → linear counting m*ln(m/V)) via the literal
    lookup table — bit-exact because the ln values are shared text
    literals, not engine math."""
    group_cols = list(group_cols)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_regs"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - reg)"))
        .cast("long")
        .alias("_zp"),
    )
    z53 = (
        F.col("_zp")
        + (F.lit(HLL_M).cast("long") - F.col("n_regs"))
        * F.lit(1 << HLL_RHO_MAX).cast("long")
    ).alias("z53")
    raw = (
        F.lit(float(HLL_ALPHA_NUM))
        * F.lit(float(1 << HLL_RHO_MAX))
        / F.lit(float(HLL_ALPHA_DEN))
        / F.col("z53").cast("double")
    ).alias("est_raw")
    # single-use literal array (the r2 literal-set trap does not bite:
    # one element_at per OUTPUT row, and output is per-group)
    lc = F.expr(
        f"element_at(array({_HLL_LC_LIST}), cast({HLL_M} - n_regs as int))"
    )
    est = (
        F.when(
            (F.col("n_regs") < HLL_M) & (F.col("est_raw") <= F.lit(HLL_LC_BOUND)),
            lc,
        )
        .otherwise(F.col("est_raw"))
        .alias("est_hll")
    )
    return (
        agg.select(*group_cols, "n_regs", z53)
        .select(*group_cols, "n_regs", "z53", raw)
        .select(*group_cols, "n_regs", "z53", "est_raw", est)
    )


def hll_sql_parts(table: str, group_col: str, value_col: str) -> str:
    """DuckDB CTE block `hll_regs` mirroring hll_registers: per-group
    register table from the same md5 code / bit split / bin()-msb rho.
    ltrim('0') guards a hypothetical zero-padded bin rendering (no-op
    on DuckDB's unpadded output; Spark's val=0 case is the CASE arm)."""
    code = f"CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
hll_parts AS (
    SELECT {group_col},
           ({code}) & {HLL_M - 1} AS idx,
           CASE WHEN (({code}) >> {HLL_P}) = 0 THEN {HLL_RHO_MAX}
                ELSE {HLL_RHO_MAX}
                     - length(ltrim(bin(({code}) >> {HLL_P}), '0'))
           END AS rho
    FROM {table}
),
hll_regs AS MATERIALIZED (
    SELECT {group_col}, idx, max(rho) AS reg
    FROM hll_parts GROUP BY {group_col}, idx
)"""


def hll_estimate_sql(regs_cte: str, group_col: str) -> str:
    """SELECT mirroring hll_estimate over a (group, idx, reg) CTE —
    identical z53 integer build, identical double chain, identical
    literal ln-lookup list for the small-range correction."""
    z53 = (
        f"CAST(sum(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - reg)) AS BIGINT)"
        f" + ({HLL_M} - count(*)) * (CAST(1 AS BIGINT) << {HLL_RHO_MAX})"
    )
    raw = (
        f"CAST({HLL_ALPHA_NUM} AS DOUBLE) * CAST({1 << HLL_RHO_MAX} AS DOUBLE)"
        f" / CAST({HLL_ALPHA_DEN} AS DOUBLE) / CAST({z53} AS DOUBLE)"
    )
    return f"""
SELECT {group_col},
       CAST(count(*) AS BIGINT) AS n_regs,
       {z53} AS z53,
       {raw} AS est_raw,
       CASE WHEN count(*) < {HLL_M} AND ({raw}) <= {HLL_LC_BOUND}
            THEN ([{_HLL_LC_LIST}])[CAST({HLL_M} - count(*) AS INT)]
            ELSE {raw}
       END AS est_hll
FROM {regs_cte}
GROUP BY {group_col}"""


# --- log-bucket quantile sketch (DDSketch-flavored, integer-exact) ----------
# The DDSketch idea (Masson et al. 2019: relative-error quantiles from
# log-spaced buckets) restated on INTEGER bit positions so both engines
# compute the identical bucket id with no engine log(): positive values
# below 32 index themselves (exact region); above, the bucket is
# (msb, next 4 bits) — 16 sub-buckets per octave, so bucket width over
# lower bound is <= 1/16 and the integer-midpoint estimate is within
# ~1/32 relative error of any value in the bucket. This is the
# RELATIVE-error companion to the fixed-width histogram sketch
# (q_quantiles_hist, error <= absolute width): per-group state is
# O(16 * log2(max_value)) counters at ANY row count, and the merge is
# counter ADDITION — the CMS algebra applied to the quantile problem
# (KMV re-ranks mins, HLL maxes registers, CMS/DDQ add counters).

DDQ_SUB_BITS = 4   # 16 sub-buckets per octave
DDQ_EXACT = 32     # 1 << (DDQ_SUB_BITS + 1): below this, buckets are exact


def _ddq_msb(v: str, engine: str) -> str:
    """floor(log2(v)) of a positive integer expression via the binary
    rendering's length — the HLL rho idiom (integer-exact both engines;
    DuckDB needs the ltrim-zeros guard, Spark's bin() is unpadded)."""
    if engine == "duckdb":
        return f"(length(ltrim(bin({v}), '0')) - 1)"
    return f"(length(bin({v})) - 1)"


def ddq_bucket_sql(v: str, engine: str) -> str:
    """Monotone bucket id of positive-integer expression {v}. Shared
    arithmetic, engine-specific msb/shift idioms only."""
    msb = _ddq_msb(v, engine)
    shr = (
        f"({v} >> ({msb} - 4))" if engine == "duckdb"
        else f"shiftright({v}, {msb} - 4)"
    )
    return (
        f"(CASE WHEN {v} < {DDQ_EXACT} THEN {v} "
        f"ELSE {DDQ_EXACT} + (({msb} - 5) * 16) + ({shr} - 16) END)"
    )


def ddq_lo_sql(b: str, engine: str) -> str:
    """Inclusive lower bound of bucket id {b} (inverse of
    ddq_bucket_sql): sub = (b-32)%16 + 16 shifted left by
    (b-32)//16 + 1 octaves; exact-region ids decode to themselves."""
    div = "//" if engine == "duckdb" else "div"
    shl = (
        f"((({b} - 32) % 16 + 16) << (({b} - 32) {div} 16 + 1))"
        if engine == "duckdb"
        else f"shiftleft(({b} - 32) % 16 + 16, ({b} - 32) {div} 16 + 1)"
    )
    return f"(CASE WHEN {b} < {DDQ_EXACT} THEN {b} ELSE {shl} END)"


def ddq_width_sql(b: str, engine: str) -> str:
    """Bucket width (hi = lo + width - 1)."""
    div = "//" if engine == "duckdb" else "div"
    shl = (
        f"(1 << (({b} - 32) {div} 16 + 1))"
        if engine == "duckdb"
        else f"shiftleft(1, ({b} - 32) {div} 16 + 1)"
    )
    return f"(CASE WHEN {b} < {DDQ_EXACT} THEN 1 ELSE {shl} END)"


def ddq_counters(
    df: DataFrame, group_cols: Sequence[str], value_expr: str
) -> DataFrame:
    """Per-group (bucket, cnt) counter table — the ONLY pass that sees
    raw volume (map-side-combining count). {value_expr} must be a
    POSITIVE integer SQL expression (callers hash out zero/negative
    domains before sketching — same precondition as DDSketch's
    positive-store)."""
    group_cols = list(group_cols)
    b = ddq_bucket_sql(value_expr, "spark")
    return (
        df.groupBy(*group_cols, F.expr(b).cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def ddq_merge(counters: DataFrame, merge_to: Sequence[str]) -> DataFrame:
    """Merge counter tables to a coarser grouping WITHOUT raw data:
    counters add. EXACT merge — the merged table bit-equals the
    from-scratch sketch over the unioned inputs."""
    return counters.groupBy(*list(merge_to), "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


# (numerator, denominator, name): quantile ranks stay INTEGER —
# ceil(p*n) via (num*n + den - 1) div den. A float ceil(0.99*n) is NOT
# portable: 0.99*n rounds UP past the integer in IEEE double for many n
# while DuckDB's DECIMAL literal product is exact (CLAUDE.md r6 trap).
DDQ_PS = ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))


def ddq_quantiles(counters: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Quantile report per group from a counter table: cumulative sum
    over bucket order (a window over <=O(16*log2(max)) bucket rows per
    group, never raw rows), first bucket whose cum reaches the integer
    rank, decoded to the integer bucket midpoint. est_* carries the
    sketch guarantee |est - exact_disc_quantile| <= width/2, i.e.
    relative error <= 1/32 outside the exact region (0 inside)."""
    from pyspark.sql import Window

    group_cols = list(group_cols)
    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(*group_cols)
    x = counters.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "total", F.sum("cnt").over(wall)
    )
    aggs = [
        F.max("total").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    ]
    for num, den, name in DDQ_PS:
        rank = F.expr(f"({num}L * total + {den - 1}L) div {den}L")
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("bucket"))).alias(f"_b_{name}")
        )
    out = x.groupBy(*group_cols).agg(*aggs)
    ests = [
        F.expr(
            f"{ddq_lo_sql(f'_b_{name}', 'spark')} + "
            f"({ddq_width_sql(f'_b_{name}', 'spark')} - 1) div 2"
        ).cast("long").alias(f"est_{name}")
        for _, _, name in DDQ_PS
    ]
    return out.select(*group_cols, "n_rows", "n_buckets", *ests)


def ddq_quantiles_sql(counters_cte: str, group_col: str) -> str:
    """DuckDB SELECT mirroring ddq_quantiles over a
    (group, bucket, cnt) CTE — identical integer ranks, identical
    decode arithmetic."""
    cols = [
        f"CAST(max(total) AS BIGINT) AS n_rows",
        f"CAST(count(*) AS BIGINT) AS n_buckets",
    ]
    for num, den, name in DDQ_PS:
        crossing = (
            f"min(CASE WHEN cum >= ({num} * total + {den - 1}) // {den} "
            f"THEN bucket END)"
        )
        cols.append(
            f"CAST({ddq_lo_sql(f'({crossing})', 'duckdb')} + "
            f"({ddq_width_sql(f'({crossing})', 'duckdb')} - 1) // 2 "
            f"AS BIGINT) AS est_{name}"
        )
    sel = ",\n       ".join(cols)
    return f"""
SELECT {group_col},
       {sel}
FROM (
    SELECT {group_col}, bucket, cnt,
           sum(cnt) OVER (PARTITION BY {group_col} ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(cnt) OVER (PARTITION BY {group_col}) AS total
    FROM {counters_cte}
)
GROUP BY {group_col}"""


def ddq_from_artifact(spark, counters_dir: str, group_cols: Sequence[str]) -> DataFrame:
    """Quantile report served from the persisted counter artifact
    (`maintain ddq` / `ddq-append`): appended delta rows merge AT READ
    TIME by the counter-add algebra (one sum per (group, bucket) over
    an O(groups * 16 * log2(max))-row table), so artifact-served
    quantiles bit-equal the from-scratch sketch at any append state —
    the monitoring read path never touches raw data."""
    return ddq_quantiles(
        ddq_merge(spark.read.parquet(counters_dir), group_cols), list(group_cols)
    )
