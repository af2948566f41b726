"""Deduplication for training-data pipelines: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Scale shapes (100 TB): every method reduces to
    shingle/feature extraction (scan-local, JVM or Arrow)
    → banded bucketing (one shuffle on a short key)
    → candidate verification within buckets (bounded joins)
    → connected components over dup pairs → canonical representative
so no step is all-pairs. Hub buckets (boilerplate text) are capped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import LinkGraph
from linkgraph.pipeline.text import doc_fingerprint


# ------------------------------------------------------------------ exact


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical (normalized) texts: returns
    [<id_col>, n_copies, fingerprint] with the minimum id as representative."""
    fp = doc_fingerprint(df.select(id_col, text_col), text_col)
    return fp.groupBy("fingerprint").agg(
        F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies")
    ).select(id_col, "n_copies", "fingerprint")


# ------------------------------------------------------------------ shingles


def _shingle_expr(text_col: str, k: int) -> F.Column:
    # substring with a Column start index needs expr; transform over a
    # position sequence keeps everything codegen'd.
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length(lower({text_col})) - {k - 1}, 1)),"
        f" i -> substring(lower({text_col}), i, {k})))"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.5,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle:
    explode distinct shingles → self-join on shingle (frequency-capped to
    kill boilerplate hubs) → |A∩B| per pair → J = |A∩B|/(|A|+|B|−|A∩B|).
    Returns [a, b, jaccard] with a < b, jaccard ≥ threshold."""
    sh = df.select(
        F.col(id_col).alias("_id"), _shingle_expr(text_col, k).alias("_sh")
    ).select("_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("s"))
    if max_shingle_freq is not None and max_shingle_freq < 2**31:
        freq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("_f"))
        sh = sh.join(freq.filter(F.col("_f") <= max_shingle_freq), "s")
    # else: cap effectively infinite — skip the frequency aggregate + join
    # entirely rather than paying a shuffle that filters nothing
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("a"),
            F.col("b._id").alias("b"),
            F.col("a._n").alias("na"),
            F.col("b._n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("ix"))
    )
    return inter.select(
        "a",
        "b",
        (
            F.col("ix").cast("double")
            / (F.col("na") + F.col("nb") - F.col("ix")).cast("double")
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


# ------------------------------------------------------------------ minhash


def _minhash_term(j: int, hash_fn: str) -> F.Column:
    """Per-seed shingle hash. xxhash64 (long, fast JVM path — the default)
    or md5 of ``shingle#j`` (string, slower but byte-identical in DuckDB —
    the engine-portable variant the oracle gate can replicate exactly)."""
    if hash_fn == "xxhash64":
        return F.xxhash64("s", F.lit(j))
    if hash_fn == "md5":
        return F.md5(F.concat(F.col("s"), F.lit(f"#{j}")))
    raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64|md5)")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document: num_hashes independent min-aggregations
    of hash(shingle, seed_j) over the exploded distinct shingle set.
    Returns [<id_col>, sig: array<long|string>]."""
    sh = df.select(
        F.col(id_col).alias("_id"), F.explode(_shingle_expr(text_col, shingle_k)).alias("s")
    )
    mins = sh.groupBy("_id").agg(
        *[F.min(_minhash_term(j, hash_fn)).alias(f"h{j}") for j in range(num_hashes)]
    )
    return mins.select(
        F.col("_id").alias(id_col),
        F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"),
    )


def minhash_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 200,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash → banded LSH bucketing → candidate pairs → exact-Jaccard
    verification. Returns [a, b, jaccard] with a < b, jaccard ≥ threshold.

    ``hash_fn='md5'`` makes every stage byte-identical to an ANSI-SQL
    replication (DuckDB oracle), at the cost of string hashing; the
    ``xxhash64`` default is the fast production path."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_k, hash_fn)
    if hash_fn == "xxhash64":
        bucket_of = lambda b: F.xxhash64(  # noqa: E731
            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band), b
        )
    else:  # md5 path: the raw joined band slice IS the (portable) bucket key
        bucket_of = lambda b: F.concat_ws(  # noqa: E731
            "|", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        )
    banded = sig.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), bucket_of)
        ).alias("band", "bucket"),
    )
    # Cap pathological buckets (boilerplate collisions): an order-free,
    # deterministic hash-mod sample. The previous row_number window sorted
    # the very bucket it was capping — a 10^5-member boilerplate bucket's
    # full membership in ONE task before discarding all but max_bucket.
    # Here bucket sizes come from an algebraic groupBy (map-side combine),
    # and membership keeps rows with pmod(xxhash64(_id, band), size) <
    # max_bucket — expected max_bucket survivors per oversized bucket, no
    # sort, no single-task concentration. Small buckets pass untouched.
    sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_bsz"))
    capped = (
        banded.join(sizes, ["band", "bucket"])
        .filter(
            (F.col("_bsz") <= max_bucket)
            | (F.pmod(F.xxhash64("_id", "band"), F.col("_bsz")) < max_bucket)
        )
        .drop("_bsz")
    )
    a, b = capped.alias("a"), capped.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("a"), F.col("b._id").alias("b"))
        .distinct()
    )
    # verify candidates with exact jaccard on shingle sets
    sh = df.select(
        F.col(id_col).alias("_id"), _shingle_expr(text_col, shingle_k).alias("_sh")
    )
    return (
        cand.join(sh.select(F.col("_id").alias("a"), F.col("_sh").alias("_sa")), "a")
        .join(sh.select(F.col("_id").alias("b"), F.col("_sh").alias("_sb")), "b")
        .select(
            "a",
            "b",
            (
                F.size(F.array_intersect("_sa", "_sb")).cast("double")
                / F.size(F.array_union("_sa", "_sb")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 200,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash → banded LSH bucketing → candidate pairs → exact Jaccard
    verification → connected components → canonical representative.

    Returns [<id_col>, rep] mapping every near-duplicate doc to the minimum
    id of its duplicate cluster (docs with no dup map to themselves).
    """
    verified = minhash_verified_pairs(
        df, id_col, text_col, num_hashes, bands, shingle_k,
        jaccard_threshold, max_bucket, hash_fn,
    )
    # duplicate clusters = connected components over verified pairs
    from linkgraph.algorithms.components import connected_components

    ids = df.select(F.col(id_col).alias("id"))
    pairs = verified.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    g = LinkGraph(pairs, nodes=ids)
    cc = connected_components(g, method="two_star", with_sizes=False)
    return cc.select(F.col("id").alias(id_col), F.col("component").alias("rep"))


# ------------------------------------------------------------------ simhash


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per document: token hashing is JVM-side
    (``transform(split(...), t -> xxhash64(t))`` — whole-stage codegen, no
    per-token Python anywhere), then a scan-local Arrow kernel does the
    per-document bit-vote with vectorized numpy (``unpackbits``/``packbits``
    on each doc's hash array). Zero shuffle. Documents with no tokens get
    signature 0. Returns [<id_col>, simhash: long].

    Measured vs the round-1 kernel (which FNV-hashed every token in a Python
    char loop): 1.8x wall on local[32] at 60M tokens, and ~15x per-core on
    the hashing itself — at 100 TB the old kernel's Python loop is the
    engine's slowest path, this one is scan-bound. Two alternatives measured
    worse here: a pure-JVM 64-column vote aggregation (codegen blowup, 7x
    slower) and a posexplode two-phase vote (64x row blowup + shuffle, 2x
    slower).

    ``hash_fn='md5'`` swaps the token hash for the first 60 bits of md5
    (big-endian hex → int, still JVM-side) so the whole signature is
    reproducible in any ANSI engine for oracle checks; the vote kernel is
    unchanged (bits 60-63 vote unanimously 0). Production path stays
    xxhash64."""
    if bits != 64:
        raise ValueError("simhash is a 64-bit implementation (xxhash64 tokens)")
    if hash_fn == "xxhash64":
        tok_hash = "xxhash64(t)"
    elif hash_fn == "md5":
        tok_hash = "cast(conv(substr(md5(t), 1, 15), 16, 10) as bigint)"
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r} (xxhash64|md5)")
    hs_col = F.expr(
        f"transform(filter(split(lower(coalesce({text_col}, '')), '\\\\s+'),"
        f" t -> t != ''), t -> {tok_hash})"
    )
    src = df.select(F.col(id_col).alias("_id"), hs_col.alias("_hs"))

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for i, arr in enumerate(pdf["_hs"]):
                if arr is None or len(arr) == 0:
                    continue
                hs = np.asarray(arr, dtype=np.int64).view(np.uint64)
                tok_bits = np.unpackbits(hs.view(np.uint8), bitorder="little").reshape(-1, 64)
                votes = 2 * tok_bits.sum(axis=0, dtype=np.int64) - len(hs)
                out[i] = (
                    np.packbits((votes > 0).astype(np.uint8), bitorder="little")
                    .copy()
                    .view(np.int64)[0]
                )
            yield pd.DataFrame({"_id": pdf["_id"].reset_index(drop=True), "simhash": out})

    id_type = dict(src.dtypes)["_id"]
    out = src.mapInPandas(kernel, f"_id {id_type}, simhash long")
    return out.select(F.col("_id").alias(id_col), "simhash")


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: block the 64-bit signature into ``blocks``
    16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical chunk), bucket-join
    on (block, chunk), verify with bit_count(xor) ≤ max_hamming.
    Returns [a, b, hamming]."""
    sig = simhash(df, id_col, text_col)
    width = 64 // blocks
    # shiftrightunsigned with a per-element shift needs the SQL form (the
    # Python helper only takes a literal int shift)
    chunk_arr = F.expr(
        f"transform(sequence(0, {blocks - 1}),"
        f" b -> shiftrightunsigned(simhash, b * {width}) & {(1 << width) - 1})"
    )
    chunks = sig.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.posexplode(chunk_arr).alias("blk", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("a"),
            F.col("b._id").alias("b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)


# ------------------------------------------------------- embedding near-dup


def embedding_cosine_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: int = 16,
    band_planes: int = 8,
) -> DataFrame:
    """Embedding near-duplicates: random-hyperplane LSH (deterministic seeded
    planes), banded bucket join, exact cosine verification.
    Returns [a, b, cosine]."""
    from linkgraph.pipeline.similarity import cosine_expr, hyperplane_signature

    if planes % band_planes != 0:
        raise ValueError(
            f"planes ({planes}) must be divisible by band_planes "
            f"({band_planes}) — leftover hyperplanes would be computed but "
            "never bucketed, silently shrinking the signature"
        )
    sig = hyperplane_signature(emb, id_col, vec_col, planes)
    bands = planes // band_planes
    banded = sig.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col("bits"), b * band_planes + 1, band_planes), b
                ),
            )
        ).alias("band", "bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("a"),
            F.col("b._id").alias("b"),
            F.col("a._v").alias("_va"),
            F.col("b._v").alias("_vb"),
        )
        .dropDuplicates(["a", "b"])
    )
    return cand.select(
        "a", "b", cosine_expr("_va", "_vb").alias("cosine")
    ).filter(F.col("cosine") >= threshold)


# ---------------------------------------------------------------- pipeline


def dedup_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.85,
    **lsh_kwargs,
) -> tuple[DataFrame, dict]:
    """End-to-end corpus deduplication: exact pass (md5 fingerprint groupBy,
    one cheap shuffle removes the bulk) then MinHash-LSH near-dup clustering
    over the survivors. Returns (deduplicated rows of ``df``, stats dict
    with input/after_exact/after_near counts).

    The exact pass runs first deliberately: at 100 TB the overwhelming share
    of duplicates is byte-identical boilerplate, and removing it shrinks the
    shingle/LSH stage's input before any banded join happens.
    """
    n_input = df.count()
    # one keeper rule for the whole engine: exact_dedup picks min(id) per
    # fingerprint — reusing it keeps batch, pipeline, and dedup_stream in
    # provable agreement instead of re-stating the rule inline
    exact_keep = exact_dedup(df, id_col, text_col).select(id_col)
    # lineage break: survivors feed the stats count, the shingle build AND
    # the signature build — without it the exact pass would re-run 3x
    survivors = df.join(exact_keep, id_col, "leftsemi").localCheckpoint(eager=True)
    n_exact = survivors.count()

    reps = minhash_lsh_dedup(
        survivors, id_col, text_col, jaccard_threshold=jaccard_threshold, **lsh_kwargs
    )
    near_keep = reps.filter(F.col(id_col) == F.col("rep")).select(id_col)
    clean = df.join(near_keep, id_col, "leftsemi").localCheckpoint(eager=True)
    n_near = clean.count()
    stats = {
        "input_rows": n_input,
        "after_exact": n_exact,
        "after_near_dup": n_near,
        "exact_removed": n_input - n_exact,
        "near_removed": n_exact - n_near,
    }
    return clean, stats


# ------------------------------------------- cross-doc duplicate-span signal


def duplicate_span_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
) -> DataFrame:
    """Inter-document duplicate-span fraction (the MassiveText/RefinedWeb
    repetition-across-documents filter signal): for each document, the
    fraction of its ``span_tokens``-token shingle POSITIONS whose span text
    also occurs in at least one OTHER document. Complements
    ``repetition_stats`` (within-doc) and the pairwise dedup family — this
    is a per-document score, not a pair list.

    Plan: token spans via sequence+slice+array_join HOFs (JVM codegen, no
    UDF); the sharing test is ONE algebraic aggregate (distinct docs per
    span), never a pairwise self-join — a boilerplate span occurring in
    10^6 docs costs one aggregate row, not 10^12 pairs. Spans are keyed by
    ``xxhash64`` immediately after extraction so every shuffle moves 8-byte
    keys instead of span strings (a 64-bit collision merges two spans with
    probability ~n^2/2^65 — negligible against near-dup noise).

    Returns DataFrame[id_col, n_spans, n_dup_spans, dup_fraction]; docs
    shorter than ``span_tokens`` tokens have 0 spans and fraction 0.0.
    """
    k = int(span_tokens)
    if k < 1:
        raise ValueError(f"span_tokens must be >= 1 (got {span_tokens})")
    toks = df.select(F.col(id_col).alias("_id"), F.split(text_col, " ").alias("_t"))
    span_expr = (
        f"case when size(_t) >= {k} then "
        f"transform(sequence(1, size(_t) - {k - 1}), i -> xxhash64(array_join(slice(_t, i, {k}), ' '))) "
        f"else array() end"
    )
    spans = toks.select("_id", F.explode(F.expr(span_expr)).alias("_h"))
    shared = (
        spans.dropDuplicates(["_id", "_h"])
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_d"))
        .filter(F.col("_d") >= 2)
        .select("_h", F.lit(True).alias("_dup"))
    )
    per_doc = (
        spans.join(shared, "_h", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count("_dup").alias("n_dup_spans"),
        )
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                F.col("n_dup_spans") / F.col("n_spans"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def drop_duplicate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    min_chars: int = 1,
) -> DataFrame:
    """Cross-document line-level dedup — the CCNet / RefinedWeb / C4-family
    boilerplate-removal transform: delete every line whose trimmed form
    occurs in at least ``min_docs`` DISTINCT documents (nav bars, cookie
    banners, footers — the lines that repeat across a crawl), keeping each
    document's remaining lines in their original order. Lines whose trimmed
    form is empty or shorter than ``min_chars`` are never removed (an empty
    line is not evidence of boilerplate). Complements
    :func:`duplicate_span_fraction` (a per-doc SCORE over token spans) —
    this one REWRITES the text, line-granular.

    Plan: posexplode lines once; the boilerplate test is ONE algebraic
    distinct-docs-per-line aggregate keyed by ``xxhash64`` of the trimmed
    line (8-byte shuffle keys, never line strings; collision odds ~n²/2^65 —
    same trade as duplicate_span_fraction); rebuild is one per-doc
    sort_array + array_join over bounded doc-sized lists. No windows, no
    UDFs, no pairwise join — a line shared by 10^6 docs costs one aggregate
    row.

    Returns DataFrame[id_col, text_col (rewritten), n_lines, n_dropped];
    a document whose every line is boilerplate comes back as ''. A NULL
    text stays NULL with 0 lines (posexplode would silently drop the row —
    the id join below keeps every input document in the output).
    """
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2 (got {min_docs})")
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_i", "_line"),
    ).withColumn("_k", F.trim("_line"))
    removable = (F.length("_k") >= int(min_chars)) & (F.col("_k") != "")
    cand = lines.filter(removable).select("_id", F.xxhash64("_k").alias("_h"))
    dup = (
        cand.dropDuplicates(["_id", "_h"])
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_d"))
        .filter(F.col("_d") >= int(min_docs))
        .select("_h", F.lit(True).alias("_dup"))
    )
    flagged = lines.withColumn(
        "_hh", F.when(removable, F.xxhash64("_k"))
    ).join(dup, F.col("_hh") == dup["_h"], "left")
    rebuilt = flagged.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count("_dup").alias("n_dropped"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("_dup").isNull(), F.struct("_i", "_line")
                        )
                    )
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("_text"),
    )
    return (
        df.select(F.col(id_col).alias("_id"))
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_text").alias(text_col),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        )
    )


def prefix_jaccard_join(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT word-set Jaccard similarity join with prefix filtering
    (SSJoin/PPJoin family): [a, b, jaccard] with a < b for every pair
    with J(A, B) ≥ threshold — lossless, unlike the frequency-CAPPED
    shingle join above (which trades recall for hub safety).

    The hub problem is solved by ORDER, not by dropping data: tokens are
    globally ranked rarest-first (doc-frequency asc, token asc), each
    document keeps only its first |x| − ⌈t·|x|⌉ + 1 ranked tokens as its
    join prefix, and the prefix-filter lemma guarantees any pair at or
    above the threshold shares a PREFIX token. Stop-word-grade tokens
    land at the END of every ranking, so they never enter the join —
    the quadratic boilerplate blowup disappears with zero recall loss.
    Survivors verify with exact set intersection on the (doc-bounded)
    full token arrays.

    Per-doc state: one sorted token array per document (collect_list
    bounded by the document's own vocabulary, same budget as the
    tfidf_top_terms aggregate) — no corpus-sized window, no Python."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    from linkgraph.pipeline.text import _words_col

    tok = (
        df.select(F.col(id_col).alias("_id"), _words_col(text_col).alias("_ws"))
        .select("_id", F.explode(F.array_distinct("_ws")).alias("_t"))
    )
    freq = tok.groupBy("_t").agg(F.count(F.lit(1)).alias("_f"))
    ranked = (
        tok.join(freq, "_t")
        .groupBy("_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("_f", "_t"))).alias("_r"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "_id",
            "_n",
            F.transform("_r", lambda x: x["_t"]).alias("_toks"),
        )
    )
    plen = (F.col("_n") - F.ceil(F.lit(float(threshold)) * F.col("_n")) + 1).cast(
        "int"
    )
    pfx = ranked.select(
        "_id", F.explode(F.slice("_toks", 1, plen)).alias("_t")
    )
    pa, pb = pfx.alias("pa"), pfx.alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa._t") == F.col("pb._t"))
            & (F.col("pa._id") < F.col("pb._id")),
        )
        .select(F.col("pa._id").alias("a"), F.col("pb._id").alias("b"))
        .distinct()
    )
    sa = ranked.select(
        F.col("_id").alias("a"), F.col("_toks").alias("_ta"), F.col("_n").alias("_na")
    )
    sb = ranked.select(
        F.col("_id").alias("b"), F.col("_toks").alias("_tb"), F.col("_n").alias("_nb")
    )
    ix = F.size(F.array_intersect("_ta", "_tb"))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (
                ix.cast("double")
                / (F.col("_na") + F.col("_nb") - ix).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
