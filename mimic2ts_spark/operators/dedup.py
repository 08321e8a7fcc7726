"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (the point of each variant):

- exact: one hash-groupBy — a single shuffle on md5(text); at 100 TB this
  is the cheapest full-corpus dedup and the baseline for everything else.
- MinHash+LSH: signatures are per-row Column math (no shuffle); the only
  shuffle is the band-bucket self-join, whose cost is ~(docs × BANDS)
  exploded rows instead of O(n²) pairs. Candidate verification (exact
  Jaccard) touches only bucket-colliding pairs.
- SimHash: one 16-bit signature per doc; near-dup = small Hamming
  distance. Signature computation is shuffle-free.
- n-gram Jaccard: exact pairwise within a blocking key (here `source`) —
  the quadratic fallback, deliberately blocked to keep pair counts sane.
- embedding cosine: brute-force pair filter; the ANN module (similarity.py)
  is the scale path.

All randomness is deterministic literals (seeded offline) so DuckDB
oracles reproduce the exact hashes; cosine/Jaccard arithmetic uses fixed
op order so floats are bit-identical cross-engine.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mimic2ts_spark.operators.spread import ensure_parallelism
from mimic2ts_spark.operators.text import MOD, SQL_TOKENS, SQL_CODE, token_code, tokens

SHINGLE_N = 3
NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS

# Deterministic affine hash params (seeded once; literals on both engines).
_rng = random.Random(42)
HASH_A = [_rng.randrange(1, MOD) for _ in range(NUM_HASHES)]
HASH_B = [_rng.randrange(0, MOD) for _ in range(NUM_HASHES)]

# 60 bits: band keys must stay fine-grained as the corpus grows (with
# max_hamming=3 the 4 pigeonhole bands get bits/4 each; 8-bit keys from a
# 32-bit signature collapsed 50k docs into 1k buckets and pair generation
# went quadratic). 60 keeps every (1 << b) and band key in signed int64
# range for both Spark and DuckDB.
SIMHASH_BITS = 60


def shingles(text: Column, n: int = SHINGLE_N) -> Column:
    """Word n-gram shingles as strings ('tok1 tok2 tok3')."""
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.greatest(F.lit(0), F.size(toks) - (n - 1)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def shingle_codes_from_token_codes(tc: Column, n: int = SHINGLE_N) -> Column:
    """Shingle codes from per-TOKEN hashes: a stepped polynomial
    k ← (k*131 + tc[i+r]) % MOD over the n-gram.

    Hashing per token then combining arithmetically is far cheaper than
    building each shingle string and md5-ing it (tokens ≪ shingles·n chars)
    — the dominant cost of the dedup family at corpus scale. Duplicates
    kept — min() is insensitive.

    Expressed as zip_with over n shifted slices of tc, NOT as
    transform(sequence(...), i -> element_at(tc, i+r)): higher-order
    functions are interpreted (no codegen, no common-subexpression
    elimination), so an element_at whose array operand is a non-trivial
    expression re-evaluates that operand per element — quadratic in
    tokens. zip_with evaluates each input array once and iterates
    (measured 11× on the sf0.1 documents table).
    """
    m = F.greatest(F.lit(0), F.size(tc) - (n - 1))
    out = F.slice(tc, 1, m)
    for r in range(1, n):
        out = F.zip_with(out, F.slice(tc, 1 + r, m), lambda a, b: (a * 131 + b) % MOD)
    return out


def with_shingle_codes(
    df: DataFrame, text_col: str = "text", out: str = "codes", n: int = SHINGLE_N
) -> DataFrame:
    """Two-step projection: token codes as a NAMED column, then shingle
    codes referencing that attribute. Inlining one Column expression would
    let Catalyst substitute (and recompute) the md5 pass under pushed-down
    filters / repeated references."""
    tc = F.transform(tokens(F.col(text_col)), lambda t: token_code(t) % MOD)
    step = df.withColumn("_tc", tc)
    return step.withColumn(out, shingle_codes_from_token_codes(F.col("_tc"), n)).drop("_tc")


def shingle_codes(text: Column, n: int = SHINGLE_N) -> Column:
    """Column-level convenience (single-use contexts only — see
    with_shingle_codes for the plan-safe DataFrame form)."""
    tc = F.transform(tokens(text), lambda t: token_code(t) % MOD)
    return shingle_codes_from_token_codes(tc, n)


def minhash_signature(codes: Column) -> Column:
    """All NUM_HASHES min-hashes as one array<long>: min over codes of
    (a_j*c + b_j) % MOD, computed in a SINGLE fold over the shingle
    array — zip_with pairs the running minima with the literal (a, b)
    parameter array per element, so the shingles are walked once instead
    of once per hash function (measured 1.6× vs 16 transform+array_min
    passes). Initial minima = MOD, an upper bound for any % MOD value."""
    ab = F.array(
        *[
            F.struct(F.lit(HASH_A[j]).alias("a"), F.lit(HASH_B[j]).alias("b"))
            for j in range(NUM_HASHES)
        ]
    )
    init = F.array_repeat(F.lit(MOD).cast("long"), NUM_HASHES)
    return F.aggregate(
        codes,
        init,
        lambda acc, c: F.zip_with(acc, ab, lambda m, p: F.least(m, (p["a"] * c + p["b"]) % MOD)),
    )


def band_key(mh: Column, band: int) -> Column:
    """Fold one band's ROWS_PER_BAND minhashes (from the signature ARRAY —
    must be a named column so element access is O(1)) into a bucket key."""
    key = F.lit(0).cast("long")
    for r in range(ROWS_PER_BAND):
        key = (key * 131 + F.element_at(mh, band * ROWS_PER_BAND + r + 1)) % MOD
    return key


def bucket_pairs(m: Column) -> Column:
    """All ordered pairs (i<j) from a sorted bucket-member array — the
    in-bucket pair generator shared by every LSH-style blocking scheme
    (minhash bands, simhash bands). Bucket sizes are bounded by the
    blocking premise, so the per-bucket combinatorics stay small; a hot
    bucket means the blocking key needs retuning, not a bigger executor."""
    n = F.size(m)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(m, i + 1, n),
                lambda right: F.struct(F.element_at(m, i).alias("left"), right.alias("right")),
            ),
        )
    )


def _jaccard_from_distinct(da: Column, db: Column) -> Column:
    """Jaccard given already-distinct sets: |∩| / (|a|+|b|−|∩|) — one
    intersect per pair instead of intersect+union, integer counts + one fp
    division (cross-engine exact, same value as the set formula)."""
    inter = F.size(F.array_intersect(da, db)).cast("long")
    union = F.size(da).cast("long") + F.size(db).cast("long") - inter
    return inter.cast("double") / union.cast("double")


def jaccard(codes_a: Column, codes_b: Column) -> Column:
    """Exact Jaccard over distinct shingle-code sets (integer counts +
    one fp division — cross-engine exact)."""
    return _jaccard_from_distinct(F.array_distinct(codes_a), F.array_distinct(codes_b))


def simhash_from_token_codes(tc: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash from per-token hash codes: bit b set iff sum over tokens of
    (±1 per code bit b) is positive. Frequency-weighted (dups count).

    Takes the token-code ARRAY (ideally a named column — see simhash), so
    the md5 tokenization pass runs once, not once per signature bit; the
    per-bit aggregates are then cheap integer passes over a materialized
    array."""

    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    counters = F.aggregate(
        tc,
        F.array_repeat(F.lit(0).cast("long"), bits),
        # one walk over the tokens; per token, bump all `bits` counters in
        # a zip against the literal power array (c & (1<<b) tests bit b —
        # shiftright needs a literal shift, so masks do the indexing)
        lambda acc, c: F.zip_with(
            acc,
            powers,
            lambda a, p: a
            + F.when(c.bitwiseAND(p) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            counters, powers, lambda cnt, p: F.when(cnt > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """Column-level convenience (single-use contexts only; prefer a named
    token-code column + simhash_from_token_codes in pipelines)."""
    return simhash_from_token_codes(F.transform(tokens(text), token_code), bits)


def _simhash_band_keys(sig: Column, max_hamming: int, bits: int) -> list[Column]:
    """Pigeonhole banding: split the signature into max_hamming+1 disjoint
    bit ranges — any pair with hamming ≤ max_hamming matches exactly on at
    least one band. Exact (no false negatives); band width shrinks as
    max_hamming grows, so buckets coarsen — the standard recall/cost dial."""
    bands = max_hamming + 1
    base_w, extra = divmod(bits, bands)
    keys, off = [], 0
    for b in range(bands):
        w = base_w + (1 if b < extra else 0)
        keys.append(F.shiftright(sig, off).bitwiseAND(F.lit((1 << w) - 1)))
        off += w
    return keys


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) → canonical min id + copy count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_banded_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(band, key, doc_id, codes) — the corpus's signature/banding state
    in persistable form: ONE scan computes shingle codes + the minhash
    signature, then explodes to BANDS rows per doc carrying the codes
    payload (the r2 carry-vs-rejoin lesson: the exact-Jaccard verify
    needs codes, and carrying them through the band shuffle beats a
    rejoin). Bands are a pure per-doc function, so a NEW-docs delta
    APPENDS rows — this is the `maintain minhash-index` artifact that
    serves incremental dedup without re-scanning the corpus.

    Pre-filter note: the cheap token-count predicate stands in for
    size(codes) > 0 — pushing a filter on the derived codes column would
    substitute the whole md5 pass into the pushed predicate (r1 trap)."""
    base = with_shingle_codes(
        ensure_parallelism(
            df.select(F.col(id_col).alias("doc_id"), text_col).where(
                F.size(tokens(F.col(text_col))) >= SHINGLE_N
            )
        )
    ).select("doc_id", "codes")
    sig = base.withColumn("_mh", minhash_signature(F.col("codes")))
    return sig.select(
        "doc_id",
        "codes",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_key(F.col("_mh"), b).alias("key"))
                    for b in range(BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "codes", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def incremental_pairs_from_index(
    spark,
    index_dir: str,
    delta: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_new, doc_old, jaccard) near-dup pairs of a delta batch
    against the PERSISTED banding index (`maintain minhash-index`) —
    the standing-corpus dedup cadence without re-scanning or
    re-hashing the corpus: the delta's one-pass banded rows equi-join
    the index on (band, key), and the exact-Jaccard verify runs on the
    codes carried in both sides. Bit-equals the cross-side pairs of the
    full-corpus minhash_lsh_pairs over corpus ∪ delta (pytest-pinned at
    every append state): banding candidates between new and old docs
    are exactly the (band, key) matches, and the verify expression is
    identical. Cost: delta hashing + one shuffle join keyed on the
    delta's bands."""
    idx = spark.read.parquet(index_dir).select(
        "band",
        "key",
        F.col("doc_id").alias("doc_old"),
        F.col("codes").alias("codes_old"),
    )
    d = minhash_banded_rows(delta, text_col=text_col, id_col=id_col).select(
        "band",
        "key",
        F.col("doc_id").alias("doc_new"),
        F.col("codes").alias("codes_new"),
    )
    cand = (
        d.join(idx, ["band", "key"])
        .select("doc_new", "doc_old", "codes_new", "codes_old")
        .dropDuplicates(["doc_new", "doc_old"])
    )
    verified = cand.withColumn(
        "jaccard", jaccard(F.col("codes_new"), F.col("codes_old"))
    )
    return verified.where(F.col("jaccard") >= threshold).select(
        "doc_new", "doc_old", "jaccard"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    on_duplicates: str = "raise",
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Plan shape at scale: signature computation is narrow (one scan);
    explode to (band, key) rows; ONE shuffle groups each LSH bucket and
    pairs are generated inside the bucket with array combinatorics. A
    band-key self-join would be the textbook formulation, but Spark
    physically recomputes a self-joined subtree — doubling the signature
    pass; the bucket-collect form reads the corpus once. Bucket sizes are
    bounded by the LSH banding premise, so the per-bucket collect is safe
    (a hot bucket means the band width needs retuning, not a bigger
    executor).

    DUP-HEAVY ROUTING (r11, VERDICT r10 #1): byte-identical docs
    collide in EVERY band — a c-copy cluster emits Θ(c²) verified pairs
    no banding can split (measured 69 s at a 150k dup-heavy corpus,
    r02). Past the sampled duplicate-share bound this raises, pointing
    at canonical_near_dup_pairs (X157); registered oracle-baseline
    callers pass on_duplicates='warn'. The probe keys md5(text) on the
    RAW input — one cheap text-md5 scan, far below the shingle+minhash
    pass, and memoized per (corpus, api, process) so repeated calls
    (gate, bench best-of rounds) pay it once."""
    from mimic2ts_spark.operators.dupguard import check_duplicate_share, doc_key

    check_duplicate_share(
        df,
        doc_key(text_col),
        id_col,
        api="minhash_lsh_pairs",
        canonical="canonical_near_dup_pairs (X157)",
        on_duplicates=on_duplicates,
    )
    # Pre-filter on the CHEAP equivalent of size(codes) > 0: at least n
    # tokens. Filtering on size(codes) itself looks free but Catalyst's
    # predicate pushdown SUBSTITUTES the whole codes expression (md5 pass
    # and all) into the pushed filter — every upstream row then pays the
    # token-hash pass several times before any join/limit prunes it.
    banded = minhash_banded_rows(df, text_col=text_col, id_col=id_col)

    members = F.array_sort(
        F.collect_list(F.struct(F.col("doc_id"), F.col("codes")))
    )  # sorted by doc_id → generated pairs satisfy doc_a < doc_b
    buckets = (
        banded.groupBy("band", "key")
        .agg(members.alias("members"))
        .where(F.size("members") >= 2)
    )

    cand = (
        buckets.select(F.explode(bucket_pairs(F.col("members"))).alias("p"))
        .select(
            F.col("p.left.doc_id").alias("doc_a"),
            F.col("p.right.doc_id").alias("doc_b"),
            F.col("p.left.codes").alias("codes_a"),
            F.col("p.right.codes").alias("codes_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    verified = cand.withColumn("jaccard", jaccard(F.col("codes_a"), F.col("codes_b")))
    return verified.where(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    hot_k: int = 1024,
    hot_sample_mod: int = 20,
    hot_df_bound: int = 200,
    on_duplicates: str = "raise",
) -> DataFrame:
    """Exact pairwise Jaccard — inverted index with AllPairs prefix
    filtering.

    Only the PREFIX of each doc's sorted code set is indexed:
    L = |x| − ⌈t·|x|⌉ + 1 codes. If J(a,b) ≥ t then |a∩b| ≥ ⌈t·|a|⌉ (the
    union is at least |a|), so the intersection cannot fit entirely in
    the ⌈t·|a|⌉−1 codes AFTER the prefix — under one global sort order
    the two prefixes must share a code (Bayardo et al., AllPairs). The
    candidate set is therefore complete; exact Jaccard on the full sets
    then removes false positives — identical output to all-pairs for
    threshold > 0 (zero-overlap pairs are the only rows it would add).

    Hot-bucket hardening (the PPJoin/AllPairs dials, Bayardo et al. /
    Xiao et al.):
    - BOILERPLATE DEMOTION: codes whose estimated document frequency
      (sampled count × `hot_sample_mod`) exceeds `hot_df_bound` docs are
      moved to the TAIL of the global code order (top-`hot_k` hottest if
      more qualify), so prefixes hold rare shingles and a boilerplate
      shingle's posting list never lands in a prefix bucket (unless a
      doc is almost pure boilerplate — exactly the docs that should
      pair). Codes below the bound stay put: their worst-case bucket is
      already ≤ `hot_df_bound` docs, and demoting them only buys per-row
      literal-array cost (a boilerplate-free corpus demotes NOTHING and
      pays nothing — measured 0.4 s of a 1.9 s query at sf0.1 when the
      top-k was allowed to fill with sampled-count-2 noise). The default
      bound is 200 docs: on the 10× duplicate-heavy sweep corpus,
      leaving df-200–500 codes undemoted tripled the query (8 s → 20 s,
      identical output) — bucket pair work grows with bound², so set
      the bound as low as the hot_k literal budget allows. The hot set
      is found by one bounded side-job (groupBy(code).count → top-k
      collect, ≤k rows to the driver — a documented broadcast-budget
      choice) and applied as
      LITERAL arrays via array_except/array_intersect: engine-native,
      no per-element lookups inside a higher-order function (the
      element_at re-evaluation trap), and no extra shuffle over posting
      volume (a full df-ordering needs a window + regroup over every
      posting — measured 2.6× slower at sf0.1 for no additional
      bucket-bound benefit, since only frequent codes make buckets hot).
      The demoted order is used ONLY for the prefix slice: the exact
      verify and the length terms are order-insensitive, so the carried
      `codes` stay in the original sorted order and the demotion
      expression is single-use — Catalyst's projection collapse would
      otherwise substitute the per-row hot-set build into every
      downstream use of `codes` (measured 1.9→1.3 s at sf0.1,
      hot_k=1024; each array_except/array_intersect against a k-element
      literal rebuilds a k-entry hash set per evaluation).
    - the POSITIONAL filter (PPJoin) prunes candidate occurrences before
      the exact-Jaccard verify: sharing the code at position pa of a and
      pb of b bounds the overlap by 1 + min(|a|−pa−1, |b|−pb−1); if that
      bound cannot reach the overlap threshold t/(1+t)·(|a|+|b|) the
      occurrence is dropped. Sound: a true pair's FIRST shared prefix
      occurrence always passes the bound (a small epsilon keeps float
      boundary cases as candidates — it can only admit extras, never
      drop truths), and `dropDuplicates` keeps a pair if ANY occurrence
      survives.

    The global total order (cold codes ascending, then hot codes
    ascending) is consistent across all docs, which is all the AllPairs
    prefix-completeness proof needs; the output set is identical to
    code-order (the exact verify is order-insensitive).

    Shape at scale: bounded hot-code side-job → ONE bucket shuffle on
    prefix codes ((1−t) of posting volume) → in-bucket pairs →
    positional prune → dedup → verify. `block_col` additionally bounds
    buckets by a blocking key.
    """
    cols = [F.col(id_col).alias("doc_id"), text_col]
    gkeys = ["code"]
    if block_col is not None:
        cols.insert(0, F.col(block_col).alias("block"))
        gkeys.insert(0, "block")
    keep = (["block"] if block_col is not None else []) + ["doc_id"]

    # cheap pre-filter instead of size(codes) > 0 — see minhash_lsh_pairs.
    # The shingle-coded base is PERSISTED (memory-and-disk) and the hot-set
    # side-job below samples the CACHE. This is load-bearing twice over:
    # the side-job and the main posting pass share one tokenize+md5 pass,
    # AND the cache pins `codes` to a single evaluation inside the posting
    # select — unpersisted, CollapseProject substitutes the md5-shingle
    # expression into every use of `codes` (the carried payload, the
    # prefix slice, both size() terms) and the pass runs ~3x (measured:
    # a source-sampled probe + fused unpersisted main = 3.37 s best-of-5
    # vs 1.50 s for this form, interleaved, sf0.1 — r04). No explicit
    # unpersist: the returned plan references the cached relation; harness
    # drivers call release_storage() between queries. At 100 TB the
    # cached form (doc_id + int64 code arrays, ~1% of raw text bytes) is
    # the same data the bucket shuffle must carry anyway.
    base = (
        with_shingle_codes(
            ensure_parallelism(
                df.select(*cols).where(F.size(tokens(F.col(text_col))) >= SHINGLE_N)
            ),
            out="_sc",
        )
        .select(*keep, F.array_sort(F.array_distinct(F.col("_sc"))).alias("codes"))
        .persist()
    )
    # DUP-HEAVY ROUTING (r11, VERDICT r10 #1): identical text ⇒ identical
    # code set ⇒ the prefix buckets pair every copy with every copy —
    # Θ(c²) per exact cluster, same argument as containment_pairs. The
    # probe runs on the PERSISTED base (its action doubles as the
    # materialization the hot-set side-job and posting pass reuse) keyed
    # on the md5 of the sorted distinct codes, and is memoized per
    # (corpus, api, process). Unpersist before re-raising so refused
    # calls never leak cached blocks (ADVICE r10).
    from mimic2ts_spark.operators.dupguard import check_duplicate_share

    try:
        check_duplicate_share(
            base,
            F.md5(
                F.concat_ws(
                    ",", F.transform(F.col("codes"), lambda v: v.cast("string"))
                )
            ),
            "doc_id",
            api="ngram_jaccard_pairs",
            canonical="canonical_docs → ngram_jaccard_pairs (the X157 "
            "exact-first doctrine)",
            on_duplicates=on_duplicates,
        )
    except Exception:
        base.unpersist()
        raise
    # bounded side-job over a DETERMINISTIC doc sample (1/hot_sample_mod
    # of ids): boilerplate shingles by construction appear in a large
    # fraction of docs, so a sample finds them, while counting the full
    # vocabulary would shuffle every distinct code (measured 3.8 s of a
    # 1.3 s query at sf0.1). Only codes whose sampled count projects to
    # df > hot_df_bound qualify, most frequent first, capped at hot_k
    # rows to the driver (a documented broadcast-budget choice). Missing
    # a mid-frequency code only leaves a bucket of that code's df —
    # bounded by ~hot_df_bound — never corpus-sized.
    hot_rows = (
        base.where(F.col("doc_id") % hot_sample_mod == 0)
        .select(F.explode("codes").alias("code"))
        .groupBy("code")
        .count()
        .where(F.col("count") >= max(2, -(-hot_df_bound // hot_sample_mod)))
        .orderBy(F.desc("count"), "code")
        .limit(hot_k)
        .collect()
    )
    if hot_rows:
        # demoted order = cold codes then hot codes, both ascending
        # (array_except/array_intersect preserve the left array's sorted
        # order, so no re-sort). Built only HERE, inside the slice — the
        # carried `codes` keep the original order.
        hot_lit = F.array(*[F.lit(r.code) for r in hot_rows])
        demoted = F.concat(
            F.array_except(F.col("codes"), hot_lit),
            F.array_intersect(F.col("codes"), hot_lit),
        )
    else:
        demoted = F.col("codes")
    prefix_len = F.size("codes") - F.ceil(F.lit(threshold) * F.size("codes")) + 1
    posting = base.select(
        *([] if block_col is None else ["block"]),
        "doc_id",
        "codes",
        F.posexplode(F.slice(demoted, 1, prefix_len)).alias("pos", "code"),
    )
    members = F.array_sort(
        F.collect_list(F.struct(F.col("doc_id"), F.col("pos"), F.col("codes")))
    )
    buckets = (
        posting.groupBy(*gkeys).agg(members.alias("members")).where(F.size("members") >= 2)
    )
    la, lb = F.size("codes_a").cast("double"), F.size("codes_b").cast("double")
    overlap_ub = 1 + F.least(
        F.size("codes_a") - F.col("pos_a") - 1, F.size("codes_b") - F.col("pos_b") - 1
    )
    positional_ok = overlap_ub.cast("double") * (1.0 + threshold) >= (
        threshold * (la + lb) - 1e-9
    )
    cand = (
        buckets.select(F.explode(bucket_pairs(F.col("members"))).alias("p"))
        .select(
            F.col("p.left.doc_id").alias("doc_a"),
            F.col("p.right.doc_id").alias("doc_b"),
            F.col("p.left.pos").alias("pos_a"),
            F.col("p.right.pos").alias("pos_b"),
            F.col("p.left.codes").alias("codes_a"),
            F.col("p.right.codes").alias("codes_b"),
        )
        .where(positional_ok)
        .dropDuplicates(["doc_a", "doc_b"])
    )
    verified = cand.withColumn(
        "jaccard", _jaccard_from_distinct(F.col("codes_a"), F.col("codes_b"))
    )
    return verified.where(F.col("jaccard") >= threshold).select("doc_a", "doc_b", "jaccard")


def canonical_docs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-dedup gate: one cheap md5 hash-groupBy collapses byte-identical
    copies to their min-id canonical row. On duplicate-heavy corpora this is
    THE scale lever for every downstream pairwise method — cluster copies
    never reach the quadratic stage (each exact cluster of c copies would
    otherwise emit Θ(c²) pairs). Composed front-end of
    canonical_near_dup_pairs / canonical_containment_pairs."""
    canon_ids = df.groupBy(F.md5(F.col(text_col)).alias("_h")).agg(
        F.min(id_col).alias(id_col)
    )
    # plain semi join (NOT broadcast): the canonical-id set is ~corpus
    # sized; AQE may still broadcast it when it is actually small
    return df.join(canon_ids.select(id_col), id_col, "left_semi")


def canonical_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """The production dedup recipe: exact-dedup FIRST (canonical_docs),
    then MinHash-LSH near-dup over canonicals only. On duplicate-heavy
    corpora this removes the quadratic in-cluster pair blow-up every
    pairwise method pays — cluster copies never reach the near-dup stage.
    Returns canonical-id pairs; exact-group membership comes from
    exact_dedup."""
    canon = canonical_docs(df, text_col=text_col, id_col=id_col)
    # canonicals are distinct on the probe key by construction — skip
    return minhash_lsh_pairs(
        canon,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        on_duplicates="ignore",
    )


def canonical_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    pre_canonical: bool = False,
) -> DataFrame:
    """Exact-first containment (the scale-safe form of containment_pairs):
    directed containment pairs over CANONICAL docs only. The raw-pair form
    is output-quadratic per exact-duplicate cluster (c copies of a quoted
    doc ⇒ Θ(c²) directed rows); canonicals keep the output at true
    cross-content containment. Identical text ⇒ identical shingle sets ⇒
    every dropped pair is recoverable from the exact groups, so the
    composed report loses no information (same theorem as
    canonical_near_dup_pairs; measured ~flat at 100× vs no-100×-row for
    the raw form — README 'Measured scaling').

    pre_canonical=True declares df ALREADY canonical (e.g. the shared
    per-corpus canonical-docs artifact) and skips the redundant
    canonicalization — value-identical because canonical_docs is
    idempotent (min-id of distinct texts is the identity)."""
    canon = (
        df
        if pre_canonical
        else canonical_docs(df, text_col=text_col, id_col=id_col)
    )
    # canonicals are distinct on the probe key by construction — skip
    return containment_pairs(
        canon,
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        on_duplicates="ignore",
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    on_duplicates: str = "raise",
) -> DataFrame:
    """SimHash near-dup pairs via pigeonhole banding — same result set as
    the textbook all-pairs Hamming check (which the DuckDB oracle runs),
    but the only wide operation is ONE shuffle on the band keys: corpus
    scanned once, signatures computed once, pairs generated inside each
    bucket and verified with one xor/bit_count. If max_hamming ≥ the
    signature width the banding guarantee degenerates; fall back to a
    single bucket (still one scan, but quadratic — only sane for tiny
    inputs / tests).

    DUP-HEAVY ROUTING (r11, VERDICT r10 #1): byte-identical docs share
    every band key (Hamming 0) — Θ(c²) pairs per exact cluster, the same
    argument as minhash_lsh_pairs. Raw-doc probe on md5(text), memoized
    per (corpus, api, process); canonical route is canonical_docs →
    simhash_pairs (the X157 exact-first doctrine)."""
    from mimic2ts_spark.operators.dupguard import check_duplicate_share, doc_key

    check_duplicate_share(
        df,
        doc_key(text_col),
        id_col,
        api="simhash_pairs",
        canonical="canonical_docs → simhash_pairs (the X157 exact-first "
        "doctrine)",
        on_duplicates=on_duplicates,
    )
    tc = F.transform(tokens(F.col(text_col)), token_code)
    sig_df = ensure_parallelism(
        df.select(F.col(id_col).alias("doc_id"), tc.alias("_tc"))
    ).select(
        "doc_id", simhash_from_token_codes(F.col("_tc")).alias("sig")
    )
    if max_hamming >= SIMHASH_BITS:
        keys = [F.lit(0).cast("long")]
    else:
        keys = _simhash_band_keys(F.col("sig"), max_hamming, SIMHASH_BITS)
    banded = sig_df.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), k.alias("key"))
                    for b, k in enumerate(keys)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sig", "bk.band", "bk.key")
    members = F.array_sort(F.collect_list(F.struct(F.col("doc_id"), F.col("sig"))))
    buckets = (
        banded.groupBy("band", "key")
        .agg(members.alias("members"))
        .where(F.size("members") >= 2)
    )
    return (
        buckets.select(F.explode(bucket_pairs(F.col("members"))).alias("p"))
        .select(
            F.col("p.left.doc_id").alias("doc_a"),
            F.col("p.right.doc_id").alias("doc_b"),
            F.bit_count(F.col("p.left.sig").bitwiseXOR(F.col("p.right.sig")))
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


# --- SQL mirrors -----------------------------------------------------------


def sql_token_codes(text: str) -> str:
    toks = SQL_TOKENS.format(text=text)
    code = SQL_CODE.format(tok="t")
    return f"list_transform({toks}, t -> {code} % {MOD})"


def sql_shingle_codes_from_tc(tc: str = "tc", n: int = SHINGLE_N) -> str:
    k = f"{tc}[i]"
    for r in range(1, n):
        k = f"(({k}) * 131 + {tc}[i + {r}]) % {MOD}"
    return (
        f"list_transform(generate_series(1, greatest(0, len({tc}) - {n - 1})), "
        f"i -> {k})"
    )


def sql_minhash(codes_expr: str, j: int) -> str:
    return (
        f"list_aggregate(list_transform({codes_expr}, "
        f"c -> ({HASH_A[j]} * c + {HASH_B[j]}) % {MOD}), 'min')"
    )


def sql_band_key(band: int) -> str:
    key = "0"
    for r in range(ROWS_PER_BAND):
        key = f"(({key}) * 131 + mh{band * ROWS_PER_BAND + r}) % {MOD}"
    return key


SQL_JACCARD = (
    "CAST(len(list_filter(list_distinct({a}), x -> list_contains(list_distinct({b}), x))) AS DOUBLE)"
    " / CAST(len(list_distinct(list_concat({a}, {b}))) AS DOUBLE)"
)


def sql_simhash(text: str, bits: int = SIMHASH_BITS) -> str:
    toks = SQL_TOKENS.format(text=text)
    code = SQL_CODE.format(tok="t")
    codes = f"list_transform({toks}, t -> {code})"
    parts = []
    for b in range(bits):
        contrib = (
            f"list_reduce(list_prepend(0::BIGINT, list_transform({codes}, "
            f"c -> CASE WHEN (c >> {b}) & 1 = 1 THEN 1::BIGINT ELSE (-1)::BIGINT END)), "
            f"(acc, x) -> acc + x)"
        )
        parts.append(f"(CASE WHEN ({contrib}) > 0 THEN {1 << b} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")::BIGINT"


def incremental_ngram_pairs(
    df: DataFrame,
    is_new: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Delta-vs-corpus near-dup: (new doc, existing doc) pairs with
    n-gram Jaccard >= threshold -- the PRODUCTION dedup shape: each
    incoming shard is checked against the accepted corpus, never
    corpus x corpus again. new-new and old-old pairs are deliberately
    NOT emitted (in-shard dedup is ngram_jaccard_pairs; the corpus is
    already deduped by invariant).

    Same exact AllPairs pruning as ngram_jaccard_pairs (sorted-prefix
    postings + length-ratio filter + exact verify -- candidate superset,
    identical output to the naive cross join), but candidate generation
    is an equi-JOIN of the new side's prefix postings against the old
    side's, not a self-bucket groupBy: the probe side is the small
    delta, so a steady small-delta cadence shuffles a fraction of the
    self-join's volume. Both sides come from ONE persisted shingle pass
    over one scan.
    """
    base = (
        with_shingle_codes(
            ensure_parallelism(
                df.select(F.col(id_col).alias("doc_id"), text_col, is_new.alias("is_new"))
                .where(F.size(tokens(F.col(text_col))) >= SHINGLE_N)
            ),
            out="_sc",
        )
        .select(
            "doc_id", "is_new", F.array_sort(F.array_distinct(F.col("_sc"))).alias("codes")
        )
        .persist()
    )
    prefix_len = F.size("codes") - F.ceil(F.lit(threshold) * F.size("codes")) + 1
    posting = base.select(
        "doc_id",
        "is_new",
        F.size("codes").alias("n"),
        "codes",
        F.explode(F.slice(F.col("codes"), 1, prefix_len)).alias("code"),
    )
    newp = posting.where(F.col("is_new")).select(
        F.col("doc_id").alias("doc_new"), F.col("n").alias("n_a"),
        F.col("codes").alias("codes_a"), "code",
    )
    oldp = posting.where(~F.col("is_new")).select(
        F.col("doc_id").alias("doc_old"), F.col("n").alias("n_b"),
        F.col("codes").alias("codes_b"), "code",
    )
    length_ok = F.least("n_a", "n_b") >= F.ceil(
        F.lit(threshold) * F.greatest("n_a", "n_b")
    )
    cand = (
        newp.join(oldp, "code")
        .where(length_ok)
        .dropDuplicates(["doc_new", "doc_old"])
    )
    verified = cand.withColumn(
        "jaccard", _jaccard_from_distinct(F.col("codes_a"), F.col("codes_b"))
    )
    return verified.where(F.col("jaccard") >= threshold).select(
        "doc_new", "doc_old", "jaccard"
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    on_duplicates: str = "raise",
) -> DataFrame:
    """Asymmetric set-containment near-dup: DIRECTED pairs
    (doc_a, doc_b) with |S_a ∩ S_b| / |S_a| ≥ threshold over distinct
    shingle-code sets — doc_a is (mostly) CONTAINED in doc_b. This is
    the duplication mode Jaccard misses: a short document quoted inside
    a long one has containment ≈ 1 but Jaccard ≈ |a|/|b|, so a
    symmetric threshold never fires. Every Jaccard-t pair also passes
    (C ≥ J always), so the output is a superset of the same-threshold
    Jaccard pairs plus the genuinely asymmetric rows.

    Pruning (exact — candidate superset + exact verify, identical
    output to the naive all-pairs form): the prefix filter applies to
    the CONTAINED side only. If |a∩b| ≥ ⌈t·|a|⌉, the intersection
    cannot hide entirely in the last ⌈t·|a|⌉ − 1 codes of a's sorted
    order, so one of a's first |a| − ⌈t·|a|⌉ + 1 codes is in b. There
    is NO length filter (containment says nothing about |b|) and the
    container side must index ALL its codes.

    Shape at scale: persisted shingle base → prefix-probe postings
    equi-join the FULL inverted index. The index side is slim
    (doc_id, code) — the container arrays re-join from the persisted
    base AFTER pair dedup (the full-posting volume is ~1/(1−t)× the
    prefix volume, so carrying arrays through it would multiply the
    shuffle; the r02 carry-vs-rejoin rule flips here because the base
    IS cached). Hot-code skew on the index side is AQE's skew-join
    case; the probe side stays rare-code-heavy by construction
    (prefixes hold the globally-rarest ordered codes).

    DUP-HEAVY ROUTING (r10, mechanical since VERDICT r09 #4): directed
    pairs are output-quadratic per exact-duplicate cluster (c copies of
    a quoted doc ⇒ Θ(c²) rows). Past the sampled duplicate-share bound
    this raises, pointing at canonical_containment_pairs (X157);
    registered oracle-baseline callers pass on_duplicates='warn'. The
    probe runs on the PERSISTED shingle base, keyed on the md5 of the
    sorted distinct codes (identical text ⇒ identical codes — and a
    cross-text code-set collision is exactly the quadratic-stage
    duplicate the guard exists for), so its action doubles as the
    base materialization the main pass reuses (r10 bench lesson: a
    separate raw-doc probe scan cost a second text pass)."""
    from mimic2ts_spark.operators.dupguard import check_duplicate_share

    base = (
        with_shingle_codes(
            ensure_parallelism(
                df.select(F.col(id_col).alias("doc_id"), text_col).where(
                    F.size(tokens(F.col(text_col))) >= SHINGLE_N
                )
            ),
            out="_sc",
        )
        .select("doc_id", F.array_sort(F.array_distinct(F.col("_sc"))).alias("codes"))
        .persist()
    )
    try:
        check_duplicate_share(
            base,
            F.md5(
                F.concat_ws(
                    ",", F.transform(F.col("codes"), lambda v: v.cast("string"))
                )
            ),
            "doc_id",
            api="containment_pairs",
            canonical="canonical_containment_pairs (X157)",
            on_duplicates=on_duplicates,
        )
    except Exception:
        # a refused call must not leak its just-persisted base into the
        # session's storage until the next release_storage (ADVICE r10)
        base.unpersist()
        raise
    prefix_len = F.size("codes") - F.ceil(F.lit(threshold) * F.size("codes")) + 1
    probe = base.select(
        F.col("doc_id").alias("doc_a"),
        F.size("codes").alias("n_a"),
        F.col("codes").alias("codes_a"),
        F.explode(F.slice(F.col("codes"), 1, prefix_len)).alias("code"),
    )
    index = base.select(
        F.col("doc_id").alias("doc_b"), F.explode("codes").alias("code")
    )
    cand = (
        probe.join(index, "code")
        .where(F.col("doc_a") != F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    withb = cand.join(
        base.select(F.col("doc_id").alias("doc_b"), F.col("codes").alias("codes_b")),
        "doc_b",
    )
    inter = F.size(F.array_intersect("codes_a", "codes_b")).cast("long")
    verified = withb.withColumn(
        "containment", inter.cast("double") / F.col("n_a").cast("double")
    )
    return verified.where(F.col("containment") >= threshold).select(
        "doc_a", "doc_b", "containment"
    )


# --- span-level exact dedup (Lee et al. 2022 "Deduplicating Training
# Data Makes Language Models Better" — repeated-substring removal,
# discretized to fixed non-overlapping token windows so membership is an
# exact hash test instead of a suffix array) -------------------------------

SPAN_W = 5          # tokens per span
SPAN_MAX_DF = 1     # keep a span only if it appears in <= this many docs


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = SPAN_W,
    max_df: int = SPAN_MAX_DF,
) -> DataFrame:
    """(doc_id, clean_text, n_kept, n_dropped): every doc rewritten with
    its cross-doc-repeated spans removed.

    Each doc is cut into consecutive w-token spans; a span whose
    distinct-doc frequency exceeds max_df anywhere in the corpus is
    dropped from EVERY doc; survivors are re-joined in original order.

    Shape at scale: span rows ~= corpus_tokens / w (linear). One
    hash-aggregate on md5(span) finds the hot spans, one shuffle join
    tags them, one groupBy(doc) rebuilds the text — three shuffles, all
    on uniformly-distributed keys (md5 / unique doc ids), no skew, no
    driver state. Docs whose text is entirely boilerplate still emit a
    row (clean_text = ''). Precondition: non-empty text (zero-token
    docs produce no span rows and would vanish)."""
    toks = tokens(F.col(text_col))
    segs = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, CAST(ceil(size(_t) / {w}.0) AS INT) - 1), "
                    f"i -> array_join(slice(_t, i * {w} + 1, {w}), ' '))"
                )
            ).alias("pos", "seg"),
        )
        # NOT persisted (r14 decision, pinned in test_plans): segs is a
        # token-level corpus-sized relation whose re-derivation is pure
        # map-side work — at 100 TB caching it costs more than the
        # second tokenize (an sf0.1 persist won only 1.19→1.06 s)
    )
    hot = (
        segs.groupBy(F.md5("seg").alias("k"))
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .where(F.col("ndocs") > max_df)
        .select("k")
    )
    tagged = segs.join(hot, F.md5(segs["seg"]) == hot["k"], "left")
    keep = F.col("k").isNull()
    return tagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(keep, F.struct("pos", "seg")))
                ),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(keep, 0).otherwise(1)).cast("long").alias("n_dropped"),
    )


def sql_span_dedup(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = SPAN_W,
    max_df: int = SPAN_MAX_DF,
) -> str:
    """DuckDB mirror: identical span cut (ceil-div window count,
    1-based inclusive slice), identical md5-of-span-string keys, rebuild
    ordered by span position."""
    toks = SQL_TOKENS.format(text=text_col)
    return f"""
WITH base AS (SELECT {id_col} AS doc_id, {toks} AS t FROM {table}),
segs AS (
    SELECT doc_id, CAST(g.i AS INTEGER) AS pos,
           array_to_string(list_slice(t, g.i * {w} + 1, g.i * {w} + {w}), ' ') AS seg
    FROM base, unnest(range((len(t) + {w} - 1) // {w})) AS g(i)
),
hot AS (
    SELECT md5(seg) AS k FROM segs
    GROUP BY 1 HAVING count(DISTINCT doc_id) > {max_df}
)
SELECT s.doc_id,
       coalesce(string_agg(s.seg, ' ' ORDER BY s.pos)
                    FILTER (WHERE h.k IS NULL), '') AS clean_text,
       CAST(count(*) FILTER (WHERE h.k IS NULL) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE h.k IS NOT NULL) AS BIGINT) AS n_dropped
FROM segs s LEFT JOIN hot h ON md5(s.seg) = h.k
GROUP BY 1
"""


def exact_text_map(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(text_md5, canon) — one row per DISTINCT text, canon = min id of
    its exact group: the exact-attach side of the canonical banding
    index (X176). New batches join this map to resolve byte-identical
    arrivals WITHOUT touching the banding stage."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_md5")).agg(
        F.min(id_col).alias("canon")
    )


def canonical_delta_edges(
    spark,
    index_dir: str,
    delta: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Exact-first incremental dedup against a CANONICAL banding index
    (`maintain minhash-index --canonical`): returns

      (edges, new_canon_docs, new_exact_rows)

    where `edges` connects every delta doc into the near-dup graph at
    delta cost on ANY corpus, including duplicate-heavy ones — the
    decision-precedence doctrine (r05 admission lesson) applied to the
    X172 artifact: byte-identical arrivals attach by ONE md5 join
    against the exact map (never reaching the banding stage, where each
    would collide with every stored copy), and only canonicals of
    genuinely new texts pay signature hashing + the (band, key) join
    against the CANONICAL-ONLY bands (one stored row per distinct text
    ⇒ no per-copy candidate fan-out). `new_canon_docs` /
    `new_exact_rows` are what an appender persists so the next batch
    sees this one.

    Component-correctness: exact-attach edges (doc → stored canon or
    batch-group canon) plus canonical near-dup edges generate the same
    connected components as the full raw pair graph — every raw pair
    (a, b) is reachable via a→canon(a)→canon(b)→b."""
    exact = spark.read.parquet(f"{index_dir}/exact")
    d = delta.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.md5(F.col(text_col)).alias("text_md5"),
    )
    hit = d.join(exact, "text_md5", "left")
    # byte-identical to a stored text: one edge to its stored canonical
    exact_edges = (
        hit.where(F.col("canon").isNotNull())
        .select(F.col("doc_id").alias("doc_a"), F.col("canon").alias("doc_b"))
        .where(F.col("doc_a") != F.col("doc_b"))
    )
    new = hit.where(F.col("canon").isNull()).drop("canon")
    # collapse new texts within the batch to their min-id group canonical
    new_exact_rows = new.groupBy("text_md5").agg(F.min("doc_id").alias("canon"))
    grouped = new.join(new_exact_rows, "text_md5")
    intra_edges = (
        grouped.where(F.col("doc_id") != F.col("canon"))
        .select(F.col("doc_id").alias("doc_a"), F.col("canon").alias("doc_b"))
    )
    new_canon_docs = (
        grouped.where(F.col("doc_id") == F.col("canon"))
        .select("doc_id", "text")
    )
    # only new canonicals reach the banding stage
    cross = incremental_pairs_from_index(
        spark, f"{index_dir}/bands", new_canon_docs,
        threshold=threshold, text_col="text", id_col="doc_id",
    ).select(F.col("doc_new").alias("doc_a"), F.col("doc_old").alias("doc_b"))
    within = minhash_lsh_pairs(
        new_canon_docs, text_col="text", id_col="doc_id", threshold=threshold,
        # canonicals are distinct on the probe key by construction — skip
        # the probe job (ADVICE r11: every delta batch paid it for nothing)
        on_duplicates="ignore",
    ).select("doc_a", "doc_b")
    edges = exact_edges.unionByName(intra_edges).unionByName(cross).unionByName(within)
    return edges, new_canon_docs, new_exact_rows


# --- content-defined chunking (CDC, X215) ------------------------------------
#
# Storage-level dedup's standard primitive (LBFS/Rabin, gear-CDC, borg/
# restic/ZFS-dedup lineage): cut chunk boundaries where a LOCAL rolling
# fingerprint satisfies hash % CDC_MOD == 0, so boundaries are a function
# of CONTENT, not position — inserting a sentence shifts every fixed-size
# chunk but leaves all content-defined chunks outside the edit region
# byte-identical (the property fixed windows lack; pytest-pinned). At
# 100 TB this is the sub-document dedup tier: identical paragraphs across
# revisions/quotes share chunk hashes without any pairwise comparison.
#
# The fingerprint is the existing SHINGLE code (stepped polynomial over
# md5 token codes — one md5 pass, shared machinery), so boundaries are
# deterministic and the oracle replays them exactly. Expected chunk
# length ≈ CDC_MOD grams. Plan shape: ONE scan, all array ops (no
# explode-join-window) — posexplode only on the final bounded chunk
# structs. HOF-substitution trap avoided by naming each intermediate
# (CollapseProject keeps non-cheap aliases single-use).

CDC_MOD = 16


def cdc_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mod: int = CDC_MOD,
) -> DataFrame:
    """(doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_hash):
    content-defined chunks per document. A boundary cuts AFTER the
    n-gram ending at token pos+SHINGLE_N whenever that gram's shingle
    code % mod == 0; chunk 1 starts at token 0; the last chunk runs to
    the end. Docs shorter than SHINGLE_N tokens are one whole-doc
    chunk."""
    # PERSISTED base: the generator expression, its implicit
    # size(chunks)>0 pushed filter, and the start/end projections each
    # substitute their inputs (no codegen/CSE for HOFs), multiplying
    # the md5 token pass ~30× per row without a collapse barrier
    # (measured 16 s → 0.9 s at sf0.1). The cache snaps substitution at
    # an InMemoryRelation; everything downstream is integer array ops
    # over cached attributes. Same pattern as containment_pairs' base.
    step1 = (
        with_shingle_codes(
            ensure_parallelism(df.select(F.col(id_col).alias("doc_id"), text_col)),
            out="_sc",
        )
        .select("doc_id", tokens(F.col(text_col)).alias("_toks"), "_sc")
        .persist()
    )
    # boundary positions via zip_with over (_sc, positions) — NEVER
    # element_at(_sc, i) inside a HOF lambda: the alias substitution
    # re-evaluates the whole shingle pipeline per element (the r01
    # quadratic trap; measured 34 s vs 0.9 s on 5k docs at sf0.01)
    pos = F.when(
        F.size("_sc") > 0, F.sequence(F.lit(0), F.size("_sc") - 1)
    ).otherwise(F.array().cast("array<int>"))
    cuts = F.array_remove(
        F.zip_with(
            F.col("_sc"),
            pos,
            lambda c, i: F.when(c % mod == 0, i + SHINGLE_N).otherwise(F.lit(-1)),
        ),
        -1,
    )
    step2 = step1.select(
        "doc_id",
        "_toks",
        F.concat(F.array(F.lit(0)), cuts).alias("_starts"),
        F.size("_toks").alias("_n"),
    )
    ends = F.concat(
        F.slice(F.col("_starts"), 2, F.size("_starts") - 1),
        F.array(F.col("_n")),
    )
    step3 = step2.select(
        "doc_id",
        "_toks",
        F.zip_with(
            F.col("_starts"), ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
        ).alias("_chunks"),
    )
    rows = step3.select(
        "doc_id", "_toks", F.posexplode("_chunks").alias("_i", "_c")
    )
    return rows.where(F.col("_c.e") > F.col("_c.s")).select(
        "doc_id",
        (F.col("_i") + 1).cast("long").alias("chunk_idx"),
        F.col("_c.s").cast("long").alias("start_tok"),
        (F.col("_c.e") - F.col("_c.s")).cast("long").alias("n_chunk_tokens"),
        F.md5(
            F.concat_ws(
                " ",
                F.slice(F.col("_toks"), F.col("_c.s") + 1, F.col("_c.e") - F.col("_c.s")),
            )
        ).alias("chunk_hash"),
    )


def sql_cdc_chunks(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    mod: int = CDC_MOD,
) -> str:
    """DuckDB mirror — identical boundary rule (1-based series i ⇒ cut
    (i−1)+SHINGLE_N equals Spark's 0-based pos+SHINGLE_N), identical
    slice semantics (toks[s+1:e] 1-based-inclusive == slice(toks, s+1,
    e−s)), md5 of the space-joined tokens."""
    toks = SQL_TOKENS.format(text=text_col)
    return f"""
WITH cdc_tok AS MATERIALIZED (
    SELECT {id_col} AS doc_id, {toks} AS toks,
           {sql_token_codes(text_col)} AS tcodes
    FROM {table}
),
cdc_sc AS (
    SELECT doc_id, toks,
           {sql_shingle_codes_from_tc('tcodes')} AS scodes
    FROM cdc_tok
),
cdc_st AS (
    SELECT doc_id, toks,
           list_prepend(CAST(0 AS BIGINT), list_transform(list_filter(
               generate_series(1, len(scodes)),
               i -> scodes[CAST(i AS INTEGER)] % {mod} = 0),
               i -> CAST(i - 1 + {SHINGLE_N} AS BIGINT))) AS starts,
           CAST(len(toks) AS BIGINT) AS n
    FROM cdc_sc
),
cdc_ch AS (
    SELECT doc_id, toks, n, starts, s.k AS k,
           starts[CAST(s.k AS INTEGER)] AS st,
           CASE WHEN s.k < len(starts)
                THEN starts[CAST(s.k + 1 AS INTEGER)] ELSE n END AS en
    FROM (
        SELECT doc_id, toks, n, starts,
               unnest(list_transform(generate_series(1, len(starts)),
                   k -> struct_pack(k := k))) AS s
        FROM cdc_st)
)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
       CAST(st AS BIGINT) AS start_tok,
       CAST(en - st AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(toks[CAST(st + 1 AS INTEGER):CAST(en AS INTEGER)], ' '))
         AS chunk_hash
FROM cdc_ch WHERE en > st
"""


# --- winnowing fingerprints (MOSS, X216) -------------------------------------
#
# Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms for
# Document Fingerprinting" (SIGMOD 2003; the MOSS plagiarism detector):
# from every window of WINNOW_W consecutive gram hashes, keep the
# minimum (ties to the smallest position) — the selected (pos, code)
# set is the document's fingerprint sketch. The GUARANTEE (the reason
# winnowing beats "hash % p == 0" sampling for matching): any shared
# substring of at least WINNOW_W + SHINGLE_N − 1 tokens contributes at
# least one common fingerprint CODE to both documents, while at most
# ~2/(W+1) of grams are kept. CDC (X215) cuts storage chunks; winnowing
# sketches for LOCAL overlap detection — complementary tiers.
#
# Shape: zero shuffles — the per-window argmin folds W shifted slices
# of the (code, pos) struct array with least() (structs compare
# lexicographically in BOTH engines — probed; code first, so ties break
# to the smaller position). Same persisted-base barrier as cdc_chunks.
# Overlap queries over the fingerprint table obey the exact-first
# doctrine: byte-identical docs share ALL fingerprints, so pair
# generation belongs on canonicals.

WINNOW_W = 8


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = WINNOW_W,
) -> DataFrame:
    """(doc_id, pos, code): the winnowing fingerprint sketch — distinct
    per-window (min code, leftmost pos) selections. Docs with fewer
    than `w` grams contribute their single global minimum; docs with no
    grams (< SHINGLE_N tokens) contribute nothing."""
    base = (
        with_shingle_codes(
            ensure_parallelism(df.select(F.col(id_col).alias("doc_id"), text_col))
        )
        .select("doc_id", F.col("codes").alias("_sc"))
        .persist()
    )
    m = F.size("_sc")
    pos = F.when(m > 0, F.sequence(F.lit(0), m - 1)).otherwise(
        F.array().cast("array<int>")
    )
    structs = F.zip_with(
        F.col("_sc"),
        pos,
        lambda c, i: F.struct(c.alias("code"), i.cast("long").alias("pos")),
    )
    step2 = base.select("doc_id", structs.alias("_st"), m.alias("_m"))
    nw = F.col("_m") - w + 1
    wmin = F.slice(F.col("_st"), 1, nw)
    for r in range(1, w):
        wmin = F.zip_with(
            wmin, F.slice(F.col("_st"), 1 + r, nw), lambda a, b: F.least(a, b)
        )
    whole = F.aggregate(
        F.slice(F.col("_st"), 2, F.col("_m")),
        F.element_at(F.col("_st"), 1),
        lambda a, x: F.least(a, x),
    )
    empty = F.array().cast("array<struct<code:bigint,pos:bigint>>")
    fps = (
        F.when(F.col("_m") >= w, F.array_distinct(wmin))
        .when(F.col("_m") > 0, F.array(whole))
        .otherwise(empty)
    )
    rows = step2.select("doc_id", F.explode(fps.alias("_fps")).alias("_f"))
    return rows.select(
        "doc_id",
        F.col("_f.pos").cast("long").alias("pos"),
        F.col("_f.code").cast("long").alias("code"),
    )


def sql_winnow_fingerprints(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = WINNOW_W,
) -> str:
    """DuckDB mirror in ROW form (windowed MIN over the (code, pos)
    struct — probed orderable): frame CURRENT..w−1 FOLLOWING at start
    pos p spans exactly grams p..p+w−1; valid starts are p ≤ m−w, plus
    the whole-doc window at p = 0 for short docs — value-identical to
    the Spark fold by the same lexicographic tie rule."""
    return f"""
WITH wn_tok AS MATERIALIZED (
    SELECT {id_col} AS doc_id, {sql_token_codes(text_col)} AS tcodes
    FROM {table}
),
wn_sc AS MATERIALIZED (
    SELECT doc_id, {sql_shingle_codes_from_tc('tcodes')} AS sc FROM wn_tok
),
wn_rows AS (
    SELECT doc_id, s.p AS pos, s.c AS code FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(sc)),
                   i -> struct_pack(p := CAST(i - 1 AS BIGINT),
                                    c := sc[CAST(i AS INTEGER)]))) AS s
        FROM wn_sc)
),
wn_m AS (SELECT doc_id, CAST(len(sc) AS BIGINT) AS m FROM wn_sc),
wn_win AS (
    SELECT doc_id, pos,
           min(struct_pack(code := code, pos := pos)) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS s
    FROM wn_rows
),
wn_sel AS (
    SELECT DISTINCT ww.doc_id, ww.s.pos AS pos, ww.s.code AS code
    FROM wn_win ww JOIN wn_m USING (doc_id)
    WHERE ww.pos <= wn_m.m - {w} OR (wn_m.m < {w} AND ww.pos = 0)
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST(code AS BIGINT) AS code
FROM wn_sel
"""


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 2,
    pre_canonical: bool = False,
) -> DataFrame:
    """(doc_a, doc_b, n_shared): undirected CANONICAL doc pairs sharing
    ≥ min_shared winnowing fingerprint codes — the MOSS-style local-
    overlap report the X216 sketch exists for (plagiarism / quote /
    boilerplate detection by shared runs rather than whole-doc
    similarity). EXACT-FIRST by construction: byte-identical copies
    share ALL fingerprints, so pair generation runs over canonical docs
    only (a c-copy cluster would otherwise pay Θ(c²) rows per shared
    code — the X213 doctrine applied at design time); exact groups
    reconstruct copy membership. The join key is the fingerprint CODE
    (winnowed density ~2/(W+1) of grams keeps postings sparse; max
    df = 6 on the gate corpus).

    pre_canonical=True declares df already canonical and skips the
    redundant canonicalization (canonical_docs is idempotent)."""
    canon = (
        df
        if pre_canonical
        else canonical_docs(df, text_col=text_col, id_col=id_col)
    )
    fp = (
        winnow_fingerprints(canon, text_col=text_col, id_col=id_col)
        .select("doc_id", "code")
        .distinct()
        .persist()  # consumed by both self-join sides
    )
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, "code")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count_distinct(F.col("code")).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def sql_winnow_overlap(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 2,
) -> str:
    """DuckDB mirror: identical canonicalization, fingerprints, and
    pair aggregation (full WITH-queries compose as CTE bodies, r05)."""
    canon = (
        f"(SELECT d.* FROM {table} d JOIN (SELECT min({id_col}) AS {id_col} "
        f"FROM {table} GROUP BY md5({text_col})) c USING ({id_col}))"
    )
    fp_sql = sql_winnow_fingerprints(
        table=canon, text_col=text_col, id_col=id_col
    )
    return f"""
WITH wfp AS MATERIALIZED ({fp_sql}),
wf2 AS (SELECT DISTINCT doc_id, code FROM wfp)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(DISTINCT a.code) AS BIGINT) AS n_shared
FROM wf2 a JOIN wf2 b ON a.code = b.code AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(DISTINCT a.code) >= {min_shared}
"""
