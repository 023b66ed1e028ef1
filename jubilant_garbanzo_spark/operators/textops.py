"""Text-analysis operators for training-data pipelines (SURVEY §2b).

Language filtering generalizes the reference's only semantic filter
(``_.getLang() == "en"``, ``main.scala:42``); the rest is the standard
pretraining-corpus toolkit: stats, quality scoring, token counting,
fingerprinting, heuristic language-ID. All pure built-in expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately minimal + deterministic (mirrored in the
#: DuckDB oracle); a production system would plug a real model in via
#: pandas_udf at this exact seam.
STOPWORDS = {
    "en": ("the", "of", "and"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "das"),
}

#: Same regex in Spark and DuckDB: word = letters, number = digit runs,
#: else single non-space symbols — a BPE-ish pre-tokenizer.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def ws_tokens(col: Column) -> Column:
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(col))


def regex_token_count(col: Column) -> Column:
    """Regex pre-tokenizer count (letters / digits / symbols)."""
    return F.size(F.regexp_extract_all(col, F.lit(TOKEN_REGEX), 0))


def stopword_hits(col: Column, words: tuple[str, ...]) -> Column:
    return F.size(
        F.filter(ws_tokens(col), lambda t: F.lower(t).isin(*words))
    )


def lang_id_heuristic(col: Column) -> Column:
    """argmax of per-language stopword hits; 'und' when all zero.
    Ties break in fixed language order (en, es, de)."""
    en = stopword_hits(col, STOPWORDS["en"])
    es = stopword_hits(col, STOPWORDS["es"])
    de = stopword_hits(col, STOPWORDS["de"])
    best = F.greatest(en, es, de)
    return (
        F.when(best == 0, "und")
        .when(en == best, "en")
        .when(es == best, "es")
        .otherwise("de")
    )


def quality_score(col: Column) -> Column:
    """Deterministic [0,1] quality heuristic: mean-token-length band +
    uniqueness ratio + length band (the shape of a Gopher-style rule
    filter, minus the proprietary thresholds)."""
    toks = ws_tokens(col)
    n = F.size(toks)
    mean_len = F.length(F.regexp_replace(col, " ", "")) / n
    uniq_ratio = F.size(F.array_distinct(toks)) / n
    len_ok = (n >= 10) & (n <= 1000)
    mean_ok = (mean_len >= 3) & (mean_len <= 10)
    return F.round(
        (len_ok.cast("int") + mean_ok.cast("int") + uniq_ratio) / 3.0, 6
    )


def fingerprint_md5(col: Column) -> Column:
    """Content fingerprint: md5 of the exact bytes (portable across
    engines; xxhash64 is Spark-only so it stays in the LSH internals)."""
    return F.md5(col)


def rolling_hash(col: Column, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over whitespace tokens: order-sensitive
    (anagram docs differ, unlike a bag-of-words hash). Computed with a
    single ``aggregate`` HOF over per-token md5-derived ints — md5 (not
    xxhash64) so the DuckDB oracle reproduces it exactly. acc < mod ≈
    2^30 and acc·31 + h < 2^35: no 64-bit overflow in either engine."""
    toks = ws_tokens(col)
    token_hash = lambda t: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"), F.lit(mod)
    )
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * base + token_hash(t)) % mod,
    )
