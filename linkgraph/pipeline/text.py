"""Text analysis over a document table — all JVM-side Column expressions
(no Python in the hot path): token counting, quality scoring, language-ID
heuristic, document fingerprinting.

Designed for the 100 TB training-data pipeline case: every function is a
narrow projection over the scan (column-pruned, predicate-pushdown-friendly),
no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "fr": ["le", "la", "les", "des", "est", "dans", "pour", "qui", "une", "sur"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "auf", "den"],
}


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Whitespace token count (0 for blank text)."""
    return df.withColumn(
        out,
        F.when(F.trim(F.col(text_col)) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
        .cast("long"),
    )


#: GPT-2-style pre-tokenizer alternation, restricted to lookahead-free
#: constructs so the same pattern runs identically under Java regex (Spark)
#: and RE2 (DuckDB oracle): contractions | space-word | space-number |
#: space-punct-run | whitespace-run.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(
    df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    """Pre-tokenizer segment count under a BPE-ish regex (the standard cheap
    proxy for LLM token counts when the real tokenizer isn't on the cluster).
    Pure JVM regexp — scan-shaped, shuffle-free."""
    return df.withColumn(
        out,
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), F.lit(0)))
        .cast("long"),
    )


def rolling_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    out: str = "rolling_fp",
    base: int = 31,
    mod: int = 1_000_000_007,
    init: int = 7,
) -> DataFrame:
    """Polynomial rolling hash (Rabin–Karp) of the raw text as a 64-bit-safe
    fingerprint: h = ((h·base + codepoint) mod p) folded left-to-right via the
    ``aggregate`` higher-order function — JVM-side, ANSI-overflow-safe
    (acc < p keeps acc·base + 255 far below 2^63), no UDF, no shuffle."""
    expr = (
        f"aggregate(split({text_col}, ''), CAST({init} AS BIGINT), "
        f"(acc, ch) -> pmod(acc * {base} + coalesce(ascii(ch), 0), {mod}))"
    )
    return df.withColumn(out, F.expr(expr))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / alpha ratio / punctuation ratio / stopword ratio / mean word
    length — the standard cheap quality filters for pretraining corpora."""
    t = F.col(text_col)
    n = F.length(t)
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    tokens = F.when(F.trim(t) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.lower(F.trim(t)), r"\W+")
    )
    stop_hits = F.size(
        F.filter(tokens, lambda x: x.isin(*LANG_MARKERS["en"]))
    )
    n_tok = F.size(tokens)
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(0.0)  # noqa: E731
    return df.select(
        "*",
        n.cast("long").alias("q_len"),
        safe(alpha, n).alias("q_alpha_ratio"),
        safe(punct, n).alias("q_punct_ratio"),
        safe(stop_hits, n_tok).alias("q_stopword_ratio"),
        safe(alpha, n_tok).alias("q_mean_word_len"),
    )


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Deterministic stopword-marker language ID over LANG_MARKERS.

    Scores each language by the count of marker-word occurrences
    (regexp_extract_all with word boundaries); argmax wins, ties broken by
    language order; no hits → 'und'. A heuristic, not a model — the point is
    the scan-shaped, shuffle-free plumbing.
    """
    lowered = F.lower(F.col(text_col))
    scores = {
        lang: F.size(
            F.regexp_extract_all(
                lowered, F.lit(r"\b(" + "|".join(words) + r")\b"), F.lit(0)
            )
        )
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in reversed(langs):  # earlier langs win ties
        s = scores[lang]
        best = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best)
        best_score = F.greatest(best_score, s)
    cols = [F.col(c) for c in df.columns]
    return df.select(
        *cols,
        best.alias(out),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in langs],
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "fingerprint"
) -> DataFrame:
    """Content fingerprint: md5 of whitespace-normalized lowercase text —
    engine-portable (DuckDB md5 matches), used as the exact-dup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm))


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    size: int = 10_000,
    min_count: int = 1,
) -> DataFrame:
    """DataFrame[token, count] — the ``size`` most frequent whitespace
    tokens, ties broken by token ascending (fully deterministic, so two
    pipeline runs — or two engines — build the SAME vocabulary; the DuckDB
    oracle replays it). The global top-k is ``orderBy().limit()``, which
    Spark executes as TakeOrderedAndProject: each map task forwards at most
    ``size`` rows, no single-task sort of the full token table.

    Beyond the reference; the vocabulary step of any tokenizer-training /
    feature-hashing pipeline."""
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")
    toks = (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    return toks.orderBy(F.desc("count"), F.asc("token")).limit(size)
