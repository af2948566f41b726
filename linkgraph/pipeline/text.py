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
    """Whitespace token count (0 for blank text). Split on whitespace runs
    and drop '' — F.trim strips only spaces, so newline/tab-terminated text
    would otherwise count a phantom trailing token."""
    return df.withColumn(
        out,
        F.size(F.array_remove(F.split(F.col(text_col), r"\s+"), "")).cast("long"),
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


# ------------------------------------------------------------- BPE training


def _merge_pair_fold(col: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right non-overlapping merge of adjacent
    ``(left, right)`` symbol pairs inside an ``array<string>`` — the exact
    replacement order BPE uses. A JVM ``aggregate`` HOF (whole-stage
    codegen), no Python: fold the array into a new one, fusing the current
    element into the accumulator's tail when the pair matches. A symbol
    produced by a merge is never re-merged within the same round
    (``aaaa`` under (a,a) → ``[aa, aa]``, not ``[aaa, a]``)."""
    merged = left + right
    return F.aggregate(
        col,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            # try_element_at: ANSI mode throws on element_at(-1) of the
            # empty initial accumulator; NULL compares false, as intended
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 10,
    word_pattern: str = "^[a-z]+$",
    vocab_cap: int = 10_000,
    min_count: int = 1,
) -> DataFrame:
    """Train byte-pair-encoding merges on a corpus (Sennrich et al. 2016):
    repeatedly merge the most frequent adjacent symbol pair, starting from
    characters. Returns DataFrame[rank, left, right, pair_count] in merge
    order — feed it to :func:`bpe_segment` to tokenize.

    Fully deterministic: candidate words are filtered to ``word_pattern``
    and capped to the ``vocab_cap`` most frequent types (count desc, word
    asc — same rule as :func:`build_vocab`); each round picks the pair by
    (pair_count desc, left asc, right asc). Stops early when no pair
    remains. Two runs — or two engines — learn the SAME merge table.

    100-TB shape: ONE corpus-sized tokenize+groupBy builds the word-TYPE
    frequency table (bounded by ``vocab_cap``); training then never touches
    the corpus again — each merge round is one explode+sum over the
    vocab-sized table (TakeOrderedAndProject top-1, one driver row) and one
    ``aggregate``-HOF rewrite of the symbol arrays. Cost is
    O(num_merges × vocab), independent of corpus size.

    Beyond the reference (no tokenizer training anywhere in it); the
    standard preprocessing step the rest of the text stack
    (:func:`bpe_token_count`, :func:`build_vocab`) approximates.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    spark = df.sparkSession
    words = (
        df.select(F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"))
        .filter(F.col("word").rlike(word_pattern))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(vocab_cap)
    )
    cur = words.select(
        F.array_remove(F.split("word", ""), "").alias("syms"), "cnt"
    ).persist()
    out_schema = "rank INT, left STRING, right STRING, pair_count LONG"
    merges: list[tuple] = []
    try:
        for rank in range(num_merges):
            top = (
                cur.select(
                    F.explode(
                        F.zip_with(
                            F.slice(F.col("syms"), F.lit(1), F.size("syms") - 1),
                            F.slice(F.col("syms"), F.lit(2), F.size("syms") - 1),
                            lambda l, r: F.struct(l.alias("l"), r.alias("r")),
                        )
                    ).alias("p"),
                    "cnt",
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("cnt").alias("pair_count"))
                .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            left, right, count = top[0]["l"], top[0]["r"], int(top[0]["pair_count"])
            merges.append((rank, left, right, count))
            nxt = cur.select(
                _merge_pair_fold(F.col("syms"), left, right).alias("syms"), "cnt"
            ).persist()
            nxt.count()  # materialize before dropping the parent cache
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    if not merges:
        return spark.createDataFrame([], out_schema)
    return spark.createDataFrame(merges, out_schema)


#: nested-HOF rounds the driver JVM stack provably survives (overflow
#: measured between 41 and 48 nested rounds on the default driver stack);
#: 32 leaves real headroom; above it, auto routes to the Arrow kernel
_HOF_MERGE_CAP = 32


def bpe_segment(
    df: DataFrame,
    merges,
    text_col: str = "text",
    out: str = "bpe_tokens",
    word_pattern: str = "^[a-z]+$",
    engine: str = "auto",
) -> DataFrame:
    """Tokenize with a learned merge table: split to whitespace words (those
    matching ``word_pattern``, mirroring :func:`learn_bpe_merges`), explode
    each to characters, apply the merges, and flatten to one
    ``array<string>`` per row. ``merges`` is the DataFrame from
    :func:`learn_bpe_merges` (collected — it is merge-table-sized, not
    data-sized) or a ``[(left, right), ...]`` list in rank order.

    Two kernels (``engine``):

    - ``"hof"``: each merge compiles to one nested ``transform`` +
      ``aggregate`` HOF — pure JVM whole-stage codegen, zero Python. The
      expression tree grows linearly with the merge count, and Spark's
      ColumnNode→Expression conversion recurses over it, so deep tables
      overflow the JVM stack (measured: between 41 and 48 nested merges
      on a default driver stack) — > 32 merges raises.
    - ``"arrow"``: one ``mapInPandas`` stage running canonical
      greedy-by-rank BPE (the GPT-2 ``bpe.py`` loop, public) with a
      per-partition word cache — production vocabularies (30k+ merges)
      at merge-count-independent per-word cost. For WELL-FORMED merge
      tables (every pair's symbols are single characters or products of
      strictly earlier merges — anything :func:`learn_bpe_merges`
      produces) greedy-by-rank is exactly sequential rank-order
      application, so the two kernels agree symbol-for-symbol (pinned in
      tests). A hand-written table whose later merge manufactures an
      EARLIER merge's pair is not well-formed; the kernels may then
      differ (the HOF never revisits a passed rank).
    - ``"auto"`` (default): HOF when the table fits its guard, else
      Arrow — small tables stay JVM-side, big ones scale.
    """
    if engine not in ("auto", "hof", "arrow"):
        raise ValueError(f"engine must be auto|hof|arrow, got {engine!r}")
    if isinstance(merges, DataFrame):
        merges = [
            (r["left"], r["right"]) for r in merges.orderBy("rank").collect()
        ]
    merges = [(str(a), str(b)) for a, b in merges]
    if engine == "auto":
        engine = "hof" if len(merges) <= _HOF_MERGE_CAP else "arrow"
    if engine == "arrow":
        return _bpe_segment_arrow(df, merges, text_col, out, word_pattern)
    if len(merges) > _HOF_MERGE_CAP:
        raise ValueError(
            f"{len(merges)} merges would compile to an oversized expression "
            "tree (JVM-stack-bound above ~40 nested HOF rounds); pass "
            "engine='arrow' beyond toy vocab sizes"
        )
    wsyms = F.transform(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"),
            lambda w: w.rlike(word_pattern),
        ),
        lambda w: F.array_remove(F.split(w, ""), ""),
    )
    def _round(pair):  # bind per-iteration; PySpark treats lambda default
        left, right = pair  # args as extra HOF parameters, so no defaults
        return lambda s: _merge_pair_fold(s, left, right)

    for pair in merges:
        wsyms = F.transform(wsyms, _round(pair))
    return df.withColumn(out, F.flatten(wsyms))


def _bpe_segment_arrow(
    df: DataFrame,
    merges: list,
    text_col: str,
    out: str,
    word_pattern: str,
) -> DataFrame:
    """One Arrow-batched ``mapInPandas`` stage: greedy-by-rank BPE with a
    per-partition word→tokens cache (corpora repeat word types heavily, so
    the kernel runs once per TYPE per partition, not per token). The merge
    table ships to executors inside the task closure — it is vocab-sized
    (30k pairs ≈ 1 MB), far under broadcast thresholds, and read-only.

    Scale shape: no shuffle, schema = input + one array<string> column,
    batches stream through Arrow — at 100 TB this is a scan-bound map
    stage exactly like the HOF path, with Python cost amortized per word
    type."""
    import re as _re

    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    # lowest rank wins on duplicate pairs, matching sequential application
    ranks: dict = {}
    for i, pair in enumerate(merges):
        ranks.setdefault(pair, i)
    if out in df.columns:
        # withColumn-replace semantics — the HOF kernel overwrites an
        # existing output column, and engine='auto' must not change
        # behavior at the merge-count crossover
        df = df.drop(out)
    out_schema = StructType(
        df.schema.fields + [StructField(out, ArrayType(StringType()), True)]
    )
    pat_src = word_pattern

    def _segment(iterator):
        # re.ASCII pins \s / \w to the ASCII classes — Java regex (the HOF
        # kernel's split + rlike) is ASCII-classed, and without the flag
        # Python's Unicode \s would split NBSP/ideographic spaces the JVM
        # kernel keeps inside a word, making engine='auto' change answers
        # at the 32-merge crossover
        pat = _re.compile(pat_src, _re.ASCII)
        cache: dict = {}

        def word_tokens(w: str) -> list:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w)
            while len(syms) > 1:
                best_rank = None
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best = r, (syms[i], syms[i + 1])
                if best is None:
                    break
                left, right = best
                fused = left + right
                nxt: list = []
                # greedy left-to-right non-overlapping, byte-for-byte the
                # _merge_pair_fold convention (a symbol produced by a merge
                # is never re-merged in the same pass: fused != left)
                for x in syms:
                    if nxt and nxt[-1] == left and x == right:
                        nxt[-1] = fused
                    else:
                        nxt.append(x)
                syms = nxt
            cache[w] = syms
            return syms

        for pdf in iterator:
            col = []
            for text in pdf[text_col]:
                if text is None:
                    col.append(None)  # HOF: null text -> null tokens
                    continue
                col.append(
                    [
                        t
                        # no .strip(): Python str.strip is Unicode-aware;
                        # leading/trailing ASCII-ws fragments become ''
                        # words that fail word_pattern, same as the HOF path
                        for w in _re.split(r"\s+", text, flags=_re.ASCII)
                        if pat.search(w)
                        for t in word_tokens(w)
                    ]
                )
            pdf = pdf.copy()
            pdf[out] = col
            yield pdf

    return df.mapInPandas(_segment, schema=out_schema)


# ------------------------------------------------------------- repetition


def _words_col(text_col: str) -> F.Column:
    """Whitespace word array with NO empty tokens: split on runs of any
    whitespace, then drop '' — F.trim only strips SPACES, so a trailing
    newline/tab would otherwise leave a phantom '' token (and split('')
    is ['']); array_remove covers leading, trailing, and empty-text cases
    in one expression."""
    return F.array_remove(F.split(F.col(text_col), r"\s+"), "")


def _grams_expr(words_col: str, n: int) -> str:
    """SQL expr: word n-gram array from a words-array column. Guarded so
    short docs yield [] (Spark's sequence(1, 0) would DESCEND, not empty)."""
    if n == 1:
        return words_col
    return (
        f"CASE WHEN size({words_col}) >= {n} THEN "
        f"transform(sequence(1, size({words_col}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({words_col}, i, {n}))) "
        f"ELSE array() END"
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_sizes: tuple = (1, 2, 3),
) -> DataFrame:
    """Gopher-style intra-document repetition metrics: for each n in
    ``ngram_sizes``, the fraction of n-gram occurrences that repeat an
    earlier occurrence — ``(total - distinct) / total`` (0.0 for docs too
    short to form a gram). High values mark boilerplate / degenerate text;
    the standard cheap repetition filter for pretraining corpora.

    Entirely higher-order functions over the words array: column-pruned
    scan, zero shuffle, zero UDF — at 100 TB this is scan-bound.
    Beyond the reference (cf. quality filters in Rae et al., Gopher App. A).
    """
    out = df.select(F.col(id_col), _words_col(text_col).alias("_w"))
    cols = [F.col(id_col), F.size("_w").cast("long").alias("n_words")]
    for n in ngram_sizes:
        g = _grams_expr("_w", n)
        total = f"size({g})"
        dup = (
            f"CASE WHEN {total} > 0 THEN "
            f"CAST({total} - size(array_distinct({g})) AS DOUBLE) / {total} "
            f"ELSE CAST(0.0 AS DOUBLE) END"
        )
        cols.append(F.expr(dup).alias(f"dup_{n}gram_frac"))
    return out.select(*cols)


def top_ngrams(
    df: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide top-k word n-grams by occurrence count (ties: gram asc) —
    the boilerplate-discovery scan. explode → one algebraic groupBy →
    TakeOrderedAndProject (each map task forwards ≤ k rows; no global sort)."""
    grams = (
        df.select(_words_col(text_col).alias("_w"))
        .select(F.explode(F.expr(_grams_expr("_w", n))).alias("gram"))
        .filter(F.col("gram") != "")
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    return grams.orderBy(F.desc("count"), F.asc("gram")).limit(k)


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k TF-IDF terms: score = tf · ln(N / df_term) with
    deterministic ties (score desc, term asc). Returns
    DataFrame[id, rank, term, score].

    Two algebraic aggregates (tf per (doc, term); document frequency per
    term) + one equi-join on term (planner-chosen strategy — the df table
    is vocabulary-sized, broadcastable only for bounded vocabularies);
    the per-doc top-k is one ``max``-style aggregate over a
    doc-vocabulary-sized collect_list (bounded by document length — NOT a
    corpus-sized window). N is the count of non-empty documents, computed
    distributively (no driver action).
    """
    toks = (
        df.select(F.col(id_col).alias("_id"), F.explode(_words_col(text_col)).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n_docs = tf.select("_id").distinct().select(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    # no broadcast hint on docfreq: it is corpus-VOCABULARY-sized, which a
    # web-scale corpus pushes to hundreds of millions of distinct tokens —
    # let the planner pick (AQE broadcasts it when it is actually small)
    scored = tf.join(docfreq, "term").crossJoin(F.broadcast(n_docs)).select(
        "_id",
        "term",
        (F.col("tf").cast("double") * F.log(F.col("n_docs") / F.col("df_t"))).alias(
            "score"
        ),
    )
    topk = (
        scored.groupBy("_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct(F.negate(F.col("score")).alias("ns"), "term", "score"))
                ),
                1,
                k,
            ).alias("top")
        )
        .select("_id", F.posexplode("top").alias("pos", "t"))
        .select(
            F.col("_id").alias(id_col),
            (F.col("pos") + 1).cast("long").alias("rank"),
            F.col("t.term").alias("term"),
            F.col("t.score").alias("score"),
        )
    )
    return topk


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hashed: bool = False,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at least
    one word n-gram with any eval document. Returns
    DataFrame[id, n_shared_grams] for contaminated docs only.

    Shape at 100 TB: the eval side is small (benchmarks are KBs-MBs) — its
    distinct gram set broadcasts; the train side is one scan + map-side
    semi-ish join, no shuffle of the corpus. ``hashed=True`` joins on
    xxhash64(gram) (8-byte keys) instead of gram strings — the production
    path; the string path is byte-portable for the DuckDB oracle.
    """
    def gramset(d: DataFrame) -> DataFrame:
        return (
            d.select(F.col(id_col).alias("_id"), _words_col(text_col).alias("_w"))
            .select("_id", F.explode(F.expr(f"array_distinct({_grams_expr('_w', n)})")).alias("gram"))
            .filter(F.col("gram") != "")
        )

    tg, eg = gramset(train), gramset(eval_df).select("gram").distinct()
    if hashed:
        tg = tg.select("_id", F.xxhash64("gram").alias("gram"))
        eg = eg.select(F.xxhash64("gram").alias("gram"))
    return (
        tg.join(F.broadcast(eg), "gram")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .select(F.col("_id").alias(id_col), "n_shared_grams")
    )


def unigram_logprob(
    df: DataFrame,
    reference: DataFrame | None = None,
    smoothing: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "mean_logprob",
) -> DataFrame:
    """Per-document mean unigram log-probability under an additively
    smoothed unigram model of ``reference`` (default: ``df`` itself) —
    the cheap language-model quality proxy: gibberish and vocabulary-
    mismatched documents score sharply lower. Returns
    DataFrame[id, n_tokens, <out>]; docs with no tokens emit no row.

    score(d) = mean over tokens t of ln((count_ref(t) + a) / (N + a·V)),
    with V = reference vocabulary size and N = reference token count;
    out-of-vocabulary tokens get count 0 (smoothed, never -inf).

    Shape at 100 TB: one algebraic count aggregate over the reference, one
    join on term (planner-chosen; the vocabulary side is bucketable), one
    mean per doc — the same two-shuffle profile as TF-IDF."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    ref = reference if reference is not None else df

    def toks(d: DataFrame) -> DataFrame:
        return d.select(
            F.col(id_col).alias("_id"), F.explode(_words_col(text_col)).alias("term")
        )

    counts = toks(ref).groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    denom = counts.agg(
        (
            F.sum("c").cast("double")
            + F.lit(float(smoothing)) * F.count(F.lit(1)).cast("double")
        ).alias("z")
    )
    return (
        toks(df)
        .join(counts, "term", "left")
        .crossJoin(F.broadcast(denom))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(float(smoothing)))
                    / F.col("z")
                )
            ).alias(out),
        )
        .select(F.col("_id").alias(id_col), "n_tokens", out)
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into fixed-size word windows with ``overlap``
    words of context carried between consecutive chunks — the standard
    long-document preparation for embedding models and context-window-
    bounded training. Returns DataFrame[id, chunk, n_chunk_tokens, text]
    with ``chunk`` 0-based; stride = chunk_tokens − overlap; the final
    chunk may be short; empty docs emit no row.

    Pure higher-order functions over the words array (slice per window
    start) + one posexplode — zero shuffle, scan-bound at 100 TB, and the
    chunk assignment is partitioning-independent by construction (it
    depends only on the row)."""
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    stride = chunk_tokens - overlap
    words = _words_col(text_col)
    # window starts: 1, 1+stride, ... while start <= size - 1 (and at least
    # one window for any non-empty doc); ceil via (size - overlap) / stride
    starts = (
        f"sequence(1, greatest(size(_w) - {overlap}, 1), {stride})"
    )
    chunks = (
        f"transform({starts}, i -> concat_ws(' ', slice(_w, i, {chunk_tokens})))"
    )
    return (
        df.select(F.col(id_col), words.alias("_w"))
        .filter(F.size("_w") > 0)
        .select(F.col(id_col), F.posexplode(F.expr(chunks)).alias("chunk", "text"))
        .select(
            id_col,
            F.col("chunk").cast("long").alias("chunk"),
            F.size(F.split("text", " ")).cast("long").alias("n_chunk_tokens"),
            "text",
        )
    )


def quality_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 1_000_000,
    max_dup_2gram: float = 0.5,
    min_alpha_ratio: float = 0.5,
    max_word_len_mean: float = 30.0,
) -> DataFrame:
    """Gopher/C4-style composite pretraining filter in ONE pass: word-count
    bounds, duplicate-bigram fraction, alphabetic-character ratio, and mean
    word length, evaluated as pure column expressions (zero shuffle, zero
    UDF — the whole filter is scan-bound). Returns the input plus ``keep``
    (boolean) and ``drop_reason`` (first failed rule in a FIXED order, null
    when kept) — the reason column is what makes filter sweeps debuggable
    at corpus scale (one groupBy tells you what each rule costs you).

    Thresholds are per-corpus knobs; the defaults are deliberately loose.
    Composes with :func:`unigram_logprob` / :func:`lang_id` downstream for
    model-based signals (they need their own aggregates)."""
    t = F.col(text_col)
    staged = df.withColumn("_w", _words_col(text_col))
    g2 = F.expr(_grams_expr("_w", 2))
    nw = F.size(F.col("_w"))  # the staged column — single evaluation
    alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    nchars = F.length(t)
    staged = staged.withColumn(
        "_dup2",
        F.when(
            F.size(g2) > 0,
            (F.size(g2) - F.size(F.array_distinct(g2))).cast("double")
            / F.size(g2),
        ).otherwise(F.lit(0.0)),
    )
    # TRUE mean word length (sum of word lengths / word count) — an
    # alpha-chars proxy lets long digit/punct junk words evade the cap
    wlen_sum = F.aggregate(
        F.col("_w"), F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_wlen = F.when(
        nw > 0, wlen_sum.cast("double") / nw
    ).otherwise(F.lit(0.0))
    reason = (
        # null text first: every later predicate would be NULL and the doc
        # would silently pass the gate (ANSI NULL propagation)
        F.when(t.isNull(), F.lit("null_text"))
        .when(nw < min_words, F.lit("too_few_words"))
        .when(nw > max_words, F.lit("too_many_words"))
        .when(F.col("_dup2") > max_dup_2gram, F.lit("repetitive"))
        .when(
            (nchars > 0)
            & (alpha.cast("double") / nchars < min_alpha_ratio),
            F.lit("low_alpha_ratio"),
        )
        .when(mean_wlen > max_word_len_mean, F.lit("words_too_long"))
    )
    return (
        staged.withColumn("drop_reason", reason)
        .withColumn("keep", F.col("drop_reason").isNull())
        .drop("_w", "_dup2")
    )


#: PII patterns in FIXED redaction order (URL first — it can contain the
#: others — then email, then the digit shapes from most to least specific).
#: Lookaround-free and backreference-free on purpose: the same pattern string
#: must behave identically under Java regex (Spark JVM) and RE2 (the DuckDB
#: oracle), and RE2 supports neither construct.
PII_PATTERNS: list[tuple[str, str]] = [
    ("url", r"https?://[^\s]+"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    redacted_col: str = "redacted",
    prefix: str = "pii_",
) -> DataFrame:
    """Regex PII scrubbing for pretraining corpora: per-type match counts on
    the ORIGINAL text plus a ``redacted`` copy with each match replaced by a
    typed placeholder (``<URL>``, ``<EMAIL>``, …), applied in the fixed
    PII_PATTERNS order so URL-embedded emails are consumed by the URL rule.

    All six counters and the six chained ``regexp_replace`` calls are JVM
    column expressions over one scan — zero shuffle, zero UDF, column-pruned
    to ``text_col`` — so the scrub runs at parquet-scan speed at 100 TB.
    Null text yields zero counts and a null ``redacted`` (concat/replace
    propagate NULL identically in Spark and the oracle engine).
    """
    t = F.col(text_col)
    counts = []
    red = t
    for name, pat in PII_PATTERNS:
        counts.append(
            F.when(
                t.isNotNull(),
                F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias(f"{prefix}{name}")
        )
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return df.select("*", *counts, red.alias(redacted_col))


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_scores: int | None = None,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Spärck Jones; Lucene's non-negative
    idf variant): score(d) = Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5)) ·
    tf/(tf + k1·(1 − b + b·dl/avgdl)). Returns the top-k
    DataFrame[id, bm25] with deterministic (score desc, id asc) order.

    Scale shape: the corpus-sized work is ONE tokenize scan feeding two
    algebraic aggregates (per-doc length; per-(doc, matched-term) tf after
    an early filter to the query vocabulary — the explode never shuffles
    non-matching tokens). N/avgdl/df_t are one-row or |query|-row tables,
    broadcast; no windows, no UDF, no driver action.

    ``round_scores=d`` rounds bm25 to d decimals BEFORE ranking: the
    per-doc term sum is float-order-dependent across partitions, so exact
    ties (identical tf and dl) can differ in the last bit run-to-run —
    rounding first makes the (score desc, id asc) top-k reproducible."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    toks = (
        df.select(F.col(id_col).alias("_id"), F.explode(_words_col(text_col)).alias("term"))
        .filter(F.col("term") != "")
    )
    toks = toks.persist()
    dl = toks.groupBy("_id").agg(F.count(F.lit(1)).alias("dl"))
    n_docs = df.select(F.col(id_col).alias("_id")).distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    tot = toks.agg(F.count(F.lit(1)).cast("double").alias("tt"))
    stats = n_docs.crossJoin(tot).select(
        "n", (F.col("tt") / F.col("n")).alias("avgdl")
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df_t"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5)
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, "_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "_id",
            (
                idf
                * F.col("tf").cast("double")
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
                    )
                )
            ).alias("_s"),
        )
        .groupBy("_id")
        .agg(F.sum("_s").alias("bm25"))
    )
    if round_scores is not None:
        scored = scored.select("_id", F.round("bm25", round_scores).alias("bm25"))
    out = (
        scored.orderBy(F.desc("bm25"), F.asc("_id"))
        .limit(k)
        .select(F.col("_id").alias(id_col), "bm25")
    )
    out = out.localCheckpoint(eager=True)
    toks.unpersist()
    return out


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str | None = None,
    max_dist: int = 1,
    q: int = 2,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Edit-distance similarity join: DataFrame[l, r, dist] of the pairs
    with ``levenshtein(l, r) <= max_dist`` over the distinct values of each
    side. All ordered pairs l != r are returned; when left IS right, the
    canonical unordered dedup is the caller's ``filter(l < r)``.

    Plan (the standard q-gram blocking join, Gravano et al., VLDB'01):

    1. distinct values each side → q-gram explode (JVM ``sequence`` +
       ``substring`` HOFs, no UDF);
    2. candidate pairs = equi-join on gram (+ a length-difference ≤
       max_dist pre-filter) — a short-key shuffle, NOT a cross join;
    3. verify with JVM ``levenshtein`` once per distinct candidate pair.

    Completeness: edit distance k destroys at most k·q of a string's
    (len−q+1) non-positional q-grams, so any pair with
    min_len ≥ q·(max_dist+1) shares ≥ 1 gram and survives blocking.
    SHORTER strings can share zero grams while matching, so they are routed
    to one brute-force block (they are bounded: |Σ|^(q·(k+1)) shapes) —
    the join is exact, verified against a full cross-join oracle.

    ``max_gram_freq`` optionally drops grams whose COMBINED left+right
    frequency exceeds the cap before the candidate join (the
    boilerplate-hub trade from ngram_jaccard): at web scale a
    stopword-gram like 'er' would dominate the shuffle; counting both
    sides bounds the per-gram join fan-out at f_l*f_r <= cap^2 even when
    one side is a small dictionary and the other is the web, at a
    DOCUMENTED recall cost — leave None for the exact join.
    """
    if max_dist < 0 or q < 1:
        raise ValueError(f"need max_dist >= 0 and q >= 1 (got {max_dist}, {q})")
    right_col = right_col or left_col
    short_len = q * (max_dist + 1)

    lv = left.select(F.col(left_col).alias("l")).filter(F.col("l").isNotNull()).distinct()
    rv = right.select(F.col(right_col).alias("r")).filter(F.col("r").isNotNull()).distinct()

    def grams(df: DataFrame, col: str) -> DataFrame:
        n = F.length(F.col(col))
        g = F.transform(
            F.sequence(F.lit(1), n - q + 1),
            lambda i: F.substring(F.col(col), i, q),
        )
        return df.filter(n >= short_len).select(
            col, F.explode(F.array_distinct(g)).alias("gram")
        )

    lg, rg = grams(lv, "l"), grams(rv, "r")
    if max_gram_freq is not None:
        # a gram is hot if it exceeds the cap on EITHER side — a left-only
        # count would keep a stopword gram that is rare in a small left
        # dictionary but appears in 10^7 right rows, and the equi-join on it
        # would emit f_l x f_r candidates, exactly the blow-up the cap bounds
        hot = (
            lg.select("gram").unionAll(rg.select("gram"))
            .groupBy("gram").agg(F.count(F.lit(1)).alias("_f"))
            .filter(F.col("_f") > max_gram_freq)
            .select("gram")
        )
        lg = lg.join(hot, "gram", "left_anti")
        rg = rg.join(hot, "gram", "left_anti")
    cand = (
        lg.join(rg, "gram")
        .filter(
            (F.col("l") != F.col("r"))
            & (F.abs(F.length("l") - F.length("r")) <= max_dist)
        )
        .select("l", "r")
        .distinct()
    )
    # short strings: both-below-threshold pairs can share no gram yet match;
    # the block is alphabet-bounded, so a broadcast cross join is exact
    ls = lv.filter(F.length("l") < short_len)
    rs = rv.filter(F.length("r") < short_len)
    short_pairs = ls.crossJoin(F.broadcast(rs)).filter(F.col("l") != F.col("r"))
    # short×long pairs within the length-difference bound can also share no
    # gram (the long side has few grams, all destroyable when its length is
    # < short_len + max_dist): include the boundary band exactly
    rl_band = rv.filter(
        (F.length("r") >= short_len) & (F.length("r") < short_len + max_dist)
    )
    band_pairs = ls.crossJoin(F.broadcast(rl_band)).filter(F.col("l") != F.col("r"))
    lb_band = lv.filter(
        (F.length("l") >= short_len) & (F.length("l") < short_len + max_dist)
    )
    band_pairs2 = rs.crossJoin(F.broadcast(lb_band)).select(
        F.col("l"), F.col("r")
    ).filter(F.col("l") != F.col("r"))

    allc = cand.union(short_pairs).union(band_pairs).union(band_pairs2).distinct()
    return allc.select(
        "l", "r", F.levenshtein("l", "r").alias("dist")
    ).filter(F.col("dist") <= max_dist)


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Corpus-level bigram PMI — the word2phrase-style collocation score
    used to merge multi-word expressions before tokenizer/embedding
    training: pmi(a,b) = ln(p(ab) / (p(a)·p(b))) with p(ab) over bigram
    occurrences and p(·) over unigram occurrences. Returns the top ``k``
    bigrams with count ≥ ``min_count`` as DataFrame[w1, w2, c_ab, pmi]
    (pmi rounded to 6 decimals; ties broken (pmi desc, w1 asc, w2 asc)).

    Shape at 100 TB: two algebraic count aggregates (unigrams, bigrams) +
    two joins of the bigram table against the vocabulary-sized unigram
    counts (planner-chosen strategy; vocabulary is bucketable) + global
    top-k as TakeOrderedAndProject — no windows, no UDFs, no all-pairs.
    ``min_count`` kills the hapax pairs whose PMI is maximal by
    construction (the standard word2phrase guard).
    """
    if min_count < 1 or k < 1:
        raise ValueError(f"need min_count >= 1 and k >= 1 (got {min_count}, {k})")
    words = df.select(_words_col(text_col).alias("_w"))
    uni = (
        words.select(F.explode("_w").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        words.select(F.explode(F.expr(_grams_expr("_w", 2))).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    n_uni = uni.agg(F.sum("c").cast("double").alias("n_uni"))
    n_bi = bi.agg(F.sum("c_ab").cast("double").alias("n_bi"))
    scored = (
        bi.filter(F.col("c_ab") >= min_count)
        .select(
            F.split("g", " ").getItem(0).alias("w1"),
            F.split("g", " ").getItem(1).alias("w2"),
            "c_ab",
        )
        .join(uni.select(F.col("t").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(uni.select(F.col("t").alias("w2"), F.col("c").alias("c_b")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "w1",
            "w2",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab") / F.col("n_bi"))
                    / ((F.col("c_a") / F.col("n_uni")) * (F.col("c_b") / F.col("n_uni")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(k)


def hashed_features(
    df: DataFrame,
    n_features: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    signed: bool = False,
) -> DataFrame:
    """Feature-hashing vectorizer (Weinberger et al., ICML'09 "hashing
    trick"): DataFrame[id, bucket, value] — the sparse COO bag-of-words
    representation with term → bucket = md5(term) mod ``n_features``. The
    fixed, vocabulary-free feature space is what a 100 TB training pipeline
    wants: no global vocab build, no dictionary broadcast, identical
    feature ids across corpus shards and across engines (the coin is a pure
    function of the term bytes, never of partitioning or RNG state).

    ``signed=True`` applies the sign trick (second independent md5 bit
    flips the contribution ±1), making the estimator unbiased under
    collisions; value is then the SIGNED sum and may be negative or zero
    (zero-sum buckets are kept — dropping them would make the output depend
    on which terms collided).

    All JVM Column expressions: split → explode → two algebraic aggregates;
    one shuffle on (id, bucket). No UDFs, no windows."""
    if n_features <= 0:
        raise ValueError(f"n_features must be positive, got {n_features}")
    tok = df.select(
        F.col(id_col), F.explode(_words_col(text_col)).alias("term")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 12), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
        % n_features
    ).alias("bucket")
    if signed:
        sign = F.when(
            F.substring(F.md5(F.concat(F.lit("sign:"), F.col("term"))), 1, 1)
            < "8",
            F.lit(1),
        ).otherwise(F.lit(-1))
        contrib = tok.select(id_col, bucket, sign.alias("s"))
        return contrib.groupBy(id_col, "bucket").agg(
            F.sum("s").cast("long").alias("value")
        )
    return tok.select(id_col, bucket).groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("value")
    )


def readability_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease and Flesch–Kincaid grade level, with the
    heuristic syllable counter standard in corpus filtering (vowel-group
    runs ``[aeiouy]+`` per word — no dictionary; deterministic and
    SQL-replayable, which a lexicon-based counter is not).

    Adds columns: r_words, r_sentences, r_syllables, r_flesch, r_fk_grade.
    Sentences = runs split by [.!?]+ that contain a letter or digit;
    degenerate inputs (no words / no sentences) score 0.0. Pure JVM column
    expressions — scan-shaped, shuffle-free, same budget as
    :func:`quality_scores`."""
    t = F.lower(F.col(text_col))
    words = F.filter(F.split(t, r"[^a-z0-9']+"), lambda w: w != "")
    n_words = F.size(words)
    syl = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), 0)), F.lit(1)),
    )
    sentences = F.filter(
        F.split(t, r"[.!?]+"), lambda s: s.rlike("[a-z0-9]")
    )
    n_sent = F.size(sentences)
    ok = (n_words > 0) & (n_sent > 0)
    wps = n_words.cast("double") / n_sent
    spw = syl.cast("double") / n_words
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fk = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return df.select(
        "*",
        F.when(ok, n_words).otherwise(0).cast("long").alias("r_words"),
        F.when(ok, n_sent).otherwise(0).cast("long").alias("r_sentences"),
        F.when(ok, syl).otherwise(0).cast("long").alias("r_syllables"),
        F.when(ok, flesch).otherwise(0.0).alias("r_flesch"),
        F.when(ok, fk).otherwise(0.0).alias("r_fk_grade"),
    )


def importance_weights(
    df: DataFrame,
    target: DataFrame,
    source: DataFrame | None = None,
    smoothing: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance log-weight per document (Xie et al., "Data
    Selection for Language Models via Importance Resampling", NeurIPS'23):

        log_ratio(d) = Σ_tokens ln p_target(t) − ln p_source(t)

    under additively smoothed unigram models of ``target`` (the
    distribution you WANT, e.g. curated text) and ``source`` (the raw
    pool; default ``df`` itself), over the SHARED vocabulary (union of
    both corpora) so out-of-vocabulary mass is treated symmetrically — an
    OOV-in-both token contributes exactly the length constant. Returns
    DataFrame[id, n_tokens, log_ratio]; docs with no tokens emit no row
    (same contract as :func:`unigram_logprob`). Positive log_ratio =
    looks more like the target than the pool.

    Shape at 100 TB: two algebraic term counts + one full-outer vocab
    join, ONE broadcastable 1-row stats aggregate, then one term join +
    one per-doc sum — the unigram_logprob profile run twice and fused:
    document text never shuffles, only (term, count) pairs do."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    src = source if source is not None else df
    a = float(smoothing)

    def toks(d: DataFrame) -> DataFrame:
        return d.select(
            F.col(id_col).alias("_id"),
            F.explode(_words_col(text_col)).alias("term"),
        )

    ct = toks(target).groupBy("term").agg(F.count(F.lit(1)).alias("ct"))
    cs = toks(src).groupBy("term").agg(F.count(F.lit(1)).alias("cs"))
    vocab = (
        ct.join(cs, "term", "full_outer")
        .select(
            "term",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cs", F.lit(0)).alias("cs"),
        )
    )
    stats = vocab.agg(
        F.sum("ct").cast("double").alias("nt"),
        F.sum("cs").cast("double").alias("ns"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    per_tok = (
        toks(df)
        .join(vocab, "term", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.log(
                    (F.coalesce("ct", F.lit(0)) + F.lit(a))
                    / (F.coalesce("cs", F.lit(0)) + F.lit(a))
                )
            ).alias("_s"),
        )
    )
    return (
        per_tok.crossJoin(F.broadcast(stats))
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            (
                F.col("_s")
                + F.col("n_tokens")
                * F.log(
                    (F.col("ns") + F.lit(a) * F.col("v"))
                    / (F.col("nt") + F.lit(a) * F.col("v"))
                )
            ).alias("log_ratio"),
        )
    )


def importance_resample(
    df: DataFrame,
    target: DataFrame,
    k: int,
    source: DataFrame | None = None,
    smoothing: float = 1.0,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR selection step: draw ``k`` documents WITHOUT replacement with
    probability ∝ exp(log_ratio), via Gumbel-top-k — key = log_ratio +
    Gumbel(md5(seed, id)), take the k largest. The Gumbel noise is a pure
    column expression over engine-portable md5 u60 draws, so the SAME
    sample materializes on every run, partitioning, and engine (the
    DuckDB oracle replays it digit-for-digit). Deterministic ties break
    on id. Returns DataFrame[id, n_tokens, log_ratio, gumbel_key],
    descending by key.

    Shape: importance_weights + ONE TakeOrderedAndProject (orderBy.limit
    — per-partition top-k then a k-row driver merge; no global sort)."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    w = importance_weights(
        df, target, source=source, smoothing=smoothing,
        id_col=id_col, text_col=text_col,
    )
    u60 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit("dsir"), F.lit(seed), F.col(id_col))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (u60.cast("double") + F.lit(0.5)) / F.lit(float(1 << 60))
    gumbel = -F.log(-F.log(u))
    return (
        w.withColumn("gumbel_key", F.col("log_ratio") + gumbel)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
    )
