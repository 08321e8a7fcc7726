"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language-ID heuristic, fingerprinting.

All are native Column expressions (split/filter/aggregate/transform —
JVM-side, codegen'd); nothing here touches Python per row. Every operator
has an exactly-mirrorable ANSI-SQL form (see harness) built on the same
deterministic token hash:

    code(t) = int64(first 15 hex digits of md5(t))

md5 is available and identical in both Spark and DuckDB, making
fingerprints/minhashes cross-engine reproducible — unlike engine-native
`hash()` functions, which differ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (matches regexp_split_to_array(text,'\\s+'))."""
    return F.split(text, r"\s+")


def token_code(tok: Column) -> Column:
    """Deterministic 60-bit token hash from md5 (cross-engine stable)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


# BPE-ish pre-tokenization classes (letters runs / digit runs / single
# punctuation), the usual pre-split a byte-pair tokenizer sees. ASCII
# classes only, so the Java and RE2 regex dialects agree byte-for-byte.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: counts BPE pre-tokenization units rather
    than whitespace words ('don't x2!' → don, ', t, x2... → 6 not 2) —
    the cheap proxy for LLM token budgeting at corpus scale."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)).cast("long")


def stopword_hits(text: Column) -> Column:
    toks = tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords (single fp division — exact)."""
    return stopword_hits(text).cast("double") / token_count(text).cast("double")


def mean_token_len(text: Column) -> Column:
    """Mean token length via exact integer char sum / single division."""
    toks = tokens(text)
    char_sum = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    return char_sum.cast("double") / F.size(toks).cast("double")


def lang_id(text: Column, min_hits: int = 2) -> Column:
    """N-gram/stopword language heuristic: enough English stopword hits →
    'en', else 'und'. (A real model is out of scope; the operator shape —
    cheap per-doc classification — is what matters at 100 TB.)"""
    return F.when(stopword_hits(text) >= min_hits, F.lit("en")).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: half length saturation, half stopword mass.

    Written as a fixed fp expression tree (same op order as the SQL mirror)
    so results are bit-identical cross-engine.
    """
    length_part = F.least(F.lit(1.0), token_count(text).cast("double") / F.lit(200.0))
    stop_part = F.least(F.lit(1.0), stopword_ratio(text) * F.lit(4.0))
    return length_part * F.lit(0.5) + stop_part * F.lit(0.5)


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint:
    fold (acc*131 + code(tok) % MOD) % MOD over tokens, acc0 = 0."""
    codes = F.transform(tokens(text), lambda t: token_code(t) % MOD)
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 131 + x) % MOD
    )


# --- SQL mirrors (DuckDB) --------------------------------------------------

SQL_TOKENS = r"regexp_split_to_array({text}, '\s+')"
SQL_CODE = "CAST(('0x' || substr(md5({tok}), 1, 15)) AS BIGINT)"
SQL_STOP_HITS = (
    "CAST(len(list_filter(" + SQL_TOKENS.format(text="lower({text})") + ", "
    "t -> t IN ('the','a','and','of','to','in','is','it'))) AS BIGINT)"
)
SQL_TOKEN_COUNT = "CAST(len(" + SQL_TOKENS + ") AS BIGINT)"


def sql_char_sum(text: str) -> str:
    toks = SQL_TOKENS.format(text=text)
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({toks}, t -> CAST(length(t) AS BIGINT))), "
        f"(acc, x) -> acc + x)"
    )


def sql_fingerprint(text: str) -> str:
    toks = SQL_TOKENS.format(text=text)
    code = SQL_CODE.format(tok="t")
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({toks}, t -> {code} % {MOD})), "
        f"(acc, x) -> (acc * 131 + x) % {MOD})"
    )
