"""BPE tokenizer-training rounds (Sennrich et al. 2016): the pair-count
→ argmax → greedy-merge loop, distributed and bit-exact cross-engine.

What a training run actually does at corpus scale: the expensive pass is
counting adjacent symbol pairs over every word occurrence — a classic
weighted wordcount (map-side combined hash-agg over the word-count
table, which is itself the only pass that sees raw volume). The argmax
is a 1-row TakeOrdered; applying the merge rule is a per-row fold over
each word's symbol array. State per round = one (pair) literal — the
merge table of a real tokenizer — so a fixed number of rounds keeps
lineage linear over the persisted word-count base.

Greedy merge semantics (the standard): occurrences are merged
left-to-right and a symbol produced by THIS round's merge never
re-merges with the following symbol ('aaa' + rule (a,a) → ('aa','a')).
Implemented as a single fold carrying (out, last-was-merged); the DuckDB
mirror encodes the same fold over a plain VARCHAR list (flag sentinel at
index 1) because DuckDB 1.0's list_reduce mis-executes struct
accumulators produced by list_transform (returns the last element
unreduced — verified in this environment; the flag-list form is
bit-equivalent).

Determinism: pair keys are `a || US || b` strings (US = \\x1f, absent
from the corpus), tie-break on (count DESC, key ASC) — identical ASCII
ordering in both engines. The per-round argmax is collected to the
driver (1 bounded row, like the IVF centroid seeds) so the next round's
merge rule is a literal in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mimic2ts_spark.operators.text import SQL_TOKENS, tokens

US = "\x1f"
BPE_ROUNDS = 2


def word_symbol_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms): corpus word counts with char-symbol arrays —
    the only pass over raw text; everything after runs on the
    vocabulary-sized table."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select("word", "cnt", F.split("word", "").alias("syms"))
    )


def pair_counts(wsc: DataFrame) -> DataFrame:
    """(pk, total): weighted adjacent-pair counts; pk = a||US||b."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, n - 1),
        F.slice(F.col("syms"), 2, n - 1),
        lambda x, y: F.concat(x, F.lit(US), y),
    )
    return (
        wsc.select("cnt", F.explode(pairs).alias("pk"))
        .groupBy("pk")
        .agg(F.sum("cnt").alias("total"))
    )


def best_pair(wsc: DataFrame) -> tuple[str, str, int]:
    """argmax pair under the deterministic (total DESC, pk ASC) order —
    ONE collected row (the merge rule becomes a plan literal)."""
    row = pair_counts(wsc).orderBy(F.desc("total"), "pk").limit(1).collect()[0]
    a, b = row["pk"].split(US)
    return a, b, int(row["total"])


def merged_syms(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right single-rule merge as a fold carrying
    (out: array<string>, lm: last-was-merged)."""
    init = F.expr("named_struct('out', CAST(array() AS array<string>), 'lm', false)")

    def step(acc, s):
        cond = (
            (F.size(acc["out"]) > 0)
            & (~acc["lm"])
            & (F.element_at(acc["out"], -1) == F.lit(a))
            & (s == F.lit(b))
        )
        merged = F.struct(
            F.concat(
                F.slice(acc["out"], F.lit(1), F.size(acc["out"]) - 1),
                F.array(F.lit(a + b)),
            ).alias("out"),
            F.lit(True).alias("lm"),
        )
        kept = F.struct(
            F.concat(acc["out"], F.array(s)).alias("out"),
            F.lit(False).alias("lm"),
        )
        return F.when(cond, merged).otherwise(kept)

    return F.aggregate(syms, init, step)["out"]


def bpe_train_summary(
    df: DataFrame, rounds: int = BPE_ROUNDS, text_col: str = "text"
) -> DataFrame:
    """(round, sym_a, sym_b, pair_count, total_syms_after): the learned
    merge table plus the corpus symbol count after each round (the
    compression scoreboard — total_syms_after strictly decreases by
    pair_count each round by construction)."""
    spark = df.sparkSession
    wsc = word_symbol_counts(df, text_col).persist()
    summaries = []
    for r in range(rounds):
        a, b, total = best_pair(wsc)
        wsc = wsc.select(
            "word", "cnt", merged_syms(F.col("syms"), a, b).alias("syms")
        )
        summaries.append(
            wsc.agg(
                F.sum(F.size("syms") * F.col("cnt")).cast("long").alias(
                    "total_syms_after"
                )
            ).select(
                F.lit(r).cast("int").alias("round"),
                F.lit(a).alias("sym_a"),
                F.lit(b).alias("sym_b"),
                F.lit(total).cast("long").alias("pair_count"),
                "total_syms_after",
            )
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out


def _train_merge_rules(wsc: DataFrame, rounds: int) -> tuple[list, DataFrame]:
    """(rules, folded word table) after `rounds` greedy merges over an
    already-persisted word_symbol_counts table. A pair-less corpus
    (all single-symbol words) trains an empty merge table and
    tokenization degrades to characters. NOTE the SQL mirror does NOT
    cover this degenerate case (its per-round CROSS JOIN against an
    empty b{r} empties the vocab) — any real text corpus has >= rounds
    mergeable pairs; the guard exists for adversarial property-test
    inputs, not the oracle path."""
    rules: list = []
    work = wsc
    for _ in range(rounds):
        top = (
            pair_counts(work).orderBy(F.desc("total"), "pk").limit(1).collect()
        )
        if not top:
            break
        a, b = top[0]["pk"].split(US)
        rules.append((a, b))
        work = work.select("word", "cnt", merged_syms(F.col("syms"), a, b).alias("syms"))
    return rules, work


def train_merges(
    df: DataFrame, rounds: int = BPE_ROUNDS, text_col: str = "text"
) -> list:
    """The trained merge table [(sym_a, sym_b), …] — the TOKENIZER
    ARTIFACT (the canonical maintained state of a training-data
    pipeline): train once via `maintain bpe`, persist with
    save_merges, and every apply pass loads it instead of re-running
    the greedy loop. Deterministic (count-desc, pair-key tie-break),
    so artifact and in-process training are bit-identical."""
    wsc = word_symbol_counts(df, text_col).persist()
    rules, _ = _train_merge_rules(wsc, rounds)
    wsc.unpersist()
    return rules


def save_merges(rules: list, path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump({"merges": [[a, b] for a, b in rules]}, f)


def load_merges(path: str) -> list:
    import json

    with open(path) as f:
        return [tuple(p) for p in json.load(f)["merges"]]


def bpe_apply_doc_stats(
    df: DataFrame,
    rounds: int = BPE_ROUNDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    merges: list | None = None,
) -> DataFrame:
    """Tokenize the corpus with the merges learned by the train loop:
    (doc_id, n_words, n_tokens, checksum) where n_tokens counts the
    post-merge symbols of every word occurrence and checksum is a
    position-weighted integer hash of the full token stream (pinning
    both segmentation AND order cross-engine).

    Scale shape — the tokenizer-application pass of a training-data
    pipeline: merges are applied ONCE PER VOCABULARY WORD (the same
    persisted word table training used — vocab-sized, not corpus-sized),
    then one shuffle joins word→(n_syms, word_hash) onto the exploded
    doc word stream and one doc_id shuffle aggregates. The merge rules
    are plan literals (the trained tokenizer's merge table), exactly how
    a production tokenizer ships."""
    from mimic2ts_spark.operators.text import MOD, token_code

    wsc = word_symbol_counts(df, text_col).persist()
    if merges is None:
        _, work = _train_merge_rules(wsc, rounds)
    else:
        # pre-trained merge table (the persisted tokenizer artifact):
        # fold the vocabulary through the loaded rules — zero training
        # jobs, the production apply cadence
        work = wsc
        for a, b in merges:
            work = work.select(
                "word", "cnt", merged_syms(F.col("syms"), a, b).alias("syms")
            )

    # position-weighted hash of the word's own symbol sequence
    sym_codes = F.transform(F.col("syms"), lambda s: token_code(s) % MOD)
    word_hash = F.aggregate(
        F.zip_with(
            sym_codes,
            F.sequence(F.lit(1), F.size("syms")),
            lambda c, i: c * i.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: (acc + v) % MOD,
    )
    vocab = work.select(
        "word",
        F.size("syms").cast("long").alias("n_syms"),
        word_hash.alias("word_hash"),
    )

    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"),
    )
    return (
        occ.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_tokens"),
            # per-term mod BEFORE the sum: each term < MOD (~1e9), so the
            # int64 accumulator survives docs of billions of words. A raw
            # Σ (pos+1)·word_hash grows ~n²/2·MOD and overflows int64
            # around 1.4e5 words — ANSI Spark would raise exactly at
            # raw-web-document scale while DuckDB's HUGEINT sum sailed on
            # (cross-engine divergence). Same reduction in the SQL mirror.
            (
                F.sum(((F.col("pos") + 1) * F.col("word_hash")) % MOD) % MOD
            ).cast("long").alias("checksum"),
        )
    )


# --- SQL mirror ------------------------------------------------------------


def _sql_fold(prev: str, b: str) -> str:
    """The flag-encoded greedy merge fold (see module docstring)."""
    return f"""(
    SELECT word, cnt, list_slice(f, 2, len(f)) AS syms FROM (
        SELECT w.word, w.cnt,
               list_reduce(
                   list_transform(w.syms, s -> ['0', s]),
                   (acc, x) -> CASE
                       WHEN len(acc) - 1 > 0 AND acc[1] = '0'
                            AND acc[-1] = {b}.ma AND x[2] = {b}.mb
                       THEN list_concat(['1'],
                            list_concat(list_slice(acc, 2, len(acc) - 1),
                                        [{b}.ma || {b}.mb]))
                       ELSE list_concat(['0'],
                            list_concat(list_slice(acc, 2, len(acc)), [x[2]]))
                   END
               ) AS f
        FROM {prev} w CROSS JOIN {b}
    )
)"""


def _sql_train_parts(table: str, rounds: int, text_col: str) -> list[str]:
    """Shared CTE chain w0 → (p{r}, b{r}, w{r+1}, s{r})* — the training
    iteration both the summary and the apply mirror build on."""
    toks = SQL_TOKENS.format(text=text_col)
    parts = [
        f"""w0 AS (
    SELECT word, CAST(count(*) AS BIGINT) AS cnt, string_split(word, '') AS syms
    FROM (SELECT unnest({toks}) AS word FROM {table}) GROUP BY 1
)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""p{r} AS (
    SELECT pk, sum(cnt) AS total FROM (
        SELECT cnt, unnest(list_transform(generate_series(1, len(syms) - 1),
               i -> syms[i] || chr(31) || syms[i + 1])) AS pk
        FROM w{r})
    GROUP BY 1
),
b{r} AS (
    SELECT string_split(pk, chr(31))[1] AS ma,
           string_split(pk, chr(31))[2] AS mb, total
    FROM p{r} ORDER BY total DESC, pk LIMIT 1
),
w{r + 1} AS {_sql_fold(f'w{r}', f'b{r}')},
s{r} AS (
    SELECT {r} AS round, b.ma AS sym_a, b.mb AS sym_b,
           CAST(b.total AS BIGINT) AS pair_count,
           (SELECT CAST(sum(len(syms) * cnt) AS BIGINT) FROM w{r + 1})
               AS total_syms_after
    FROM b{r} b
)"""
        )
    return parts


def sql_bpe_train_summary(
    table: str = "documents", rounds: int = BPE_ROUNDS, text_col: str = "text"
) -> str:
    parts = _sql_train_parts(table, rounds, text_col)
    selects = " UNION ALL ".join(f"SELECT * FROM s{r}" for r in range(rounds))
    return "WITH " + ",\n".join(parts) + "\n" + selects


def sql_bpe_apply_doc_stats(
    table: str = "documents",
    rounds: int = BPE_ROUNDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Mirror of bpe_apply_doc_stats: the same trained w{rounds} vocab,
    the same position-weighted step-modular hash."""
    from mimic2ts_spark.operators.text import MOD, SQL_CODE

    toks = SQL_TOKENS.format(text=text_col)
    code = SQL_CODE.format(tok="syms[CAST(i AS INTEGER)]")
    parts = _sql_train_parts(table, rounds, text_col)
    parts.append(
        f"""vocab AS (
    SELECT word, CAST(len(syms) AS BIGINT) AS n_syms,
           list_reduce(
               list_prepend(0::BIGINT,
                   list_transform(generate_series(1, len(syms)),
                       i -> ({code} % {MOD}) * i)),
               (acc, v) -> (acc + v) % {MOD}) AS word_hash
    FROM w{rounds}
)"""
    )
    parts.append(
        f"""occ AS (
    SELECT {id_col} AS doc_id, g.i - 1 AS pos,
           ({toks})[CAST(g.i AS INTEGER)] AS word
    FROM {table}, unnest(generate_series(1, len({toks}))) AS g(i)
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT o.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(v.n_syms) AS BIGINT) AS n_tokens,
       CAST(sum(((o.pos + 1) * v.word_hash) % {MOD}) % {MOD} AS BIGINT) AS checksum
FROM occ o JOIN vocab v ON o.word = v.word
GROUP BY o.doc_id
"""
    )
