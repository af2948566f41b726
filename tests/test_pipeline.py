"""Training-data pipeline ops: text analysis, dedup (exact/minhash/simhash/
jaccard), similarity search, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.pipeline.dedup import (
    embedding_cosine_dups,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dups,
)
from linkgraph.pipeline.multimodal import (
    decode_image,
    extract_features,
    sample_frames,
    synthesize_media,
)
from linkgraph.pipeline.similarity import cosine_topk, lsh_cosine_topk
from linkgraph.pipeline.text import doc_fingerprint, lang_id, quality_scores, token_count

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog and the cat"),
    (2, "The quick brown fox jumps over the lazy dog and the cat"),  # exact dup of 1
    (3, "The quick brown fox jumps over the lazy dog and the rat"),  # near dup of 1
    (4, "el rapido zorro marron salta sobre el perro con los gatos"),
    (5, "completely different content about databases and spark engines"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_token_count_and_quality(spark, docs):
    tc = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    assert tc[1] == 12 and tc[6] == 0
    q = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert q[6]["q_alpha_ratio"] == 0.0
    assert 0.7 < q[1]["q_alpha_ratio"] < 0.9
    assert q[1]["q_stopword_ratio"] > q[4]["q_stopword_ratio"]


def test_lang_id(spark, docs):
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert got[1] == "en"
    assert got[4] == "es"
    assert got[6] == "und"


def test_exact_dedup(spark, docs):
    reps = exact_dedup(docs).collect()
    by_id = {r["doc_id"]: r["n_copies"] for r in reps}
    assert by_id[1] == 2  # docs 1 and 2 collapse
    assert 2 not in by_id
    assert by_id[3] == 1
    # fingerprint is normalization-insensitive
    fp = doc_fingerprint(spark.createDataFrame(
        [(1, "A  b\tc"), (2, "a b c ")], ["doc_id", "text"]))
    vals = [r["fingerprint"] for r in fp.collect()]
    assert vals[0] == vals[1]


def test_ngram_jaccard(spark, docs):
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 5) not in pairs


def test_minhash_lsh_dedup(spark, docs):
    reps = {r["doc_id"]: r["rep"] for r in
            minhash_lsh_dedup(docs, jaccard_threshold=0.5).collect()}
    assert reps[1] == reps[2] == reps[3] == 1  # near-dup cluster → min id
    assert reps[4] == 4 and reps[5] == 5


def test_simhash(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh[1] == sh[2]  # identical text → identical signature
    ham13 = bin((sh[1] ^ sh[3]) & (2**64 - 1)).count("1")
    ham15 = bin((sh[1] ^ sh[5]) & (2**64 - 1)).count("1")
    assert ham13 < ham15  # near dup closer than unrelated
    # pigeonhole recall guarantee needs blocks > max_hamming: with 16 blocks
    # any pair within hamming 15 shares at least one identical 4-bit chunk
    assert ham13 <= 15
    dups = {(r["a"], r["b"]) for r in
            simhash_near_dups(docs, max_hamming=ham13, blocks=16).collect()}
    assert (1, 2) in dups and (1, 3) in dups


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(5, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # id+100 = tiny perturbation of id (near-dup)
        rows.append((i + 100, [float(x + 0.01 * rng.normal()) for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk(spark, emb):
    top = cosine_topk(emb, query_id=0, k=3).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cosine"] == pytest.approx(1.0)
    assert top[1]["vec_id"] == 100  # its perturbation
    assert top[1]["cosine"] > 0.99


def test_lsh_cosine_topk_recall(spark, emb):
    exact = [r["vec_id"] for r in cosine_topk(emb, 0, k=2).collect()]
    approx = [r["vec_id"] for r in
              lsh_cosine_topk(emb, 0, k=2, n_planes=16, band_planes=2).collect()]
    assert approx[0] == exact[0]
    assert set(exact) & set(approx)


def test_embedding_cosine_dups(spark, emb):
    dups = {(r["a"], r["b"]) for r in
            embedding_cosine_dups(emb, threshold=0.99, planes=16,
                                  band_planes=2).collect()}
    assert all((i, i + 100) in dups for i in range(5))


def test_multimodal_plumbing(spark):
    media = synthesize_media(spark, n_rows=30)
    assert media.count() == 30
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == 16 for r in rows)
    norms = [float(np.linalg.norm(r["features"])) for r in rows]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)
    # deterministic across re-computation
    again = {r["media_id"]: list(r["features"]) for r in
             extract_features(media, dim=16).collect()}
    first = {r["media_id"]: list(r["features"]) for r in rows}
    assert first == again

    frames = sample_frames(media, every_n=5)
    assert frames.count() > 0
    assert frames.filter("frame_idx % 5 != 0").count() == 0

    # real decode on real payloads: every image row parses
    decoded = decode_image(media.filter("kind = 'image'")).collect()
    assert len(decoded) == 10
    for r in decoded:
        assert len(r["pixels"]) == r["width"] * r["height"] * 3

    # compressed formats are the honest stub: magic-byte rejection
    jpegish = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0fakejpeg"))], "media_id long, payload binary"
    )
    with pytest.raises(Exception) as ei:
        decode_image(jpegish).collect()
    assert "STUB" in str(ei.value)


def test_bpe_token_count(spark):
    from linkgraph.pipeline.text import bpe_token_count

    rows = [(1, "Hello, world! It's 42 degrees."), (2, ""), (3, "   ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(df).collect()}
    # Hello | , | <sp>world | ! | <sp>It | 's | <sp>42 | <sp>degrees | .
    assert got[1] == 9
    assert got[2] == 0
    assert got[3] == 1  # one whitespace run


def test_rolling_fingerprint(spark):
    from linkgraph.pipeline.text import rolling_fingerprint

    df = spark.createDataFrame([(1, "ab"), (2, "ba"), (3, "ab")], ["doc_id", "text"])
    got = {r["doc_id"]: r["rolling_fp"] for r in rolling_fingerprint(df).collect()}
    # order-sensitive (unlike a bag-of-chars hash) and deterministic
    assert got[1] == got[3] != got[2]
    h = ((7 * 31 + ord("a")) * 31 + ord("b")) % 1_000_000_007
    assert got[1] == h


def test_ivf_index_recall(spark, emb):
    from linkgraph.pipeline.similarity import IVFIndex, cosine_topk

    ivf = IVFIndex(n_centroids=4, seed=3).fit(emb)
    exact = [r["vec_id"] for r in cosine_topk(emb, 0, k=3).collect()]
    # probing every list == exhaustive: must equal brute force
    full = [r["vec_id"] for r in ivf.search_id(0, k=3, n_probe=4).collect()]
    assert full == exact
    # probing 2/4 lists: the query's own list is always probed, so the
    # query vector itself (cosine 1.0) must surface
    approx = [r["vec_id"] for r in ivf.search_id(0, k=3, n_probe=2).collect()]
    assert approx[0] == 0
    with pytest.raises(KeyError):
        ivf.search_id(99999)


def test_dedup_corpus_pipeline(spark, docs):
    from linkgraph.pipeline.dedup import dedup_corpus

    clean, stats = dedup_corpus(docs, jaccard_threshold=0.5)
    kept = {r["doc_id"] for r in clean.collect()}
    # doc 2 is an exact dup of 1; doc 3 is a near dup of 1 at J>=0.5
    assert kept == {1, 4, 5, 6}
    assert stats["input_rows"] == 6
    assert stats["exact_removed"] == 1
    assert stats["near_removed"] == 1


def test_resize_images_real(spark):
    from linkgraph.pipeline.multimodal import (
        _parse_bmp,
        resize_images,
        synthesize_media,
    )

    media = synthesize_media(spark, n_rows=12)
    out = resize_images(media, width=8, height=4)
    rows = out.collect()
    assert len(rows) == media.filter("kind = 'image'").count()
    # output is a REAL re-encoded BMP: 54-byte header + 4 rows of 8·3=24
    # bytes (already 4-byte aligned)
    assert all(len(bytes(r["payload"])) == 54 + 4 * 24 for r in rows)
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 4 for r in rows)
    # round-trips through the decoder, and NN sampling preserves the
    # top-left pixel exactly
    src = {r["media_id"]: _parse_bmp(bytes(r["payload"]))
           for r in media.filter("kind = 'image'").collect()}
    for r in rows:
        small = _parse_bmp(bytes(r["payload"]))
        assert small.shape == (4, 8, 3)
        assert (small[0, 0] == src[r["media_id"]][0, 0]).all()
    # deterministic
    again = {r["media_id"]: bytes(r["payload"])
             for r in resize_images(media, width=8, height=4).collect()}
    assert {r["media_id"]: bytes(r["payload"]) for r in rows} == again


def test_quantize_embeddings_roundtrip(spark):
    import pytest as _pt

    from linkgraph.pipeline.similarity import dequantize_expr, quantize_embeddings
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    q = quantize_embeddings(e)
    rows = {r["vec_id"]: r for r in q.collect()}
    assert rows[1]["q_scale"] == 1.0
    assert rows[1]["q_embedding"] == [127, -64, 32, 0]  # round(±x·127)
    assert rows[2]["q_scale"] == 0.0 and rows[2]["q_embedding"] == [0, 0, 0, 0]
    # round-trip error bounded by scale/(2·127) per coordinate
    dq = q.select("vec_id", dequantize_expr("q_embedding", "q_scale").alias("d"))
    d1 = {r["vec_id"]: r["d"] for r in dq.collect()}
    for orig, rec in zip([1.0, -0.5, 0.25, 0.0], d1[1]):
        assert abs(orig - rec) <= 1.0 / (2 * 127) + 1e-12
    assert d1[2] == [0.0, 0.0, 0.0, 0.0]
    with _pt.raises(ValueError):
        quantize_embeddings(e, bits=9)
    # scan-shaped: no shuffle, no Python
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_quantized_topk_matches_brute_ranking(spark):
    from linkgraph.pipeline.similarity import cosine_topk, quantized_cosine_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    brute = [r["vec_id"] for r in cosine_topk(e, query_id=0, k=10).collect()]
    quant = [r["vec_id"] for r in quantized_cosine_topk(e, query_id=0, k=10).collect()]
    # int8 keeps cosine to ~1e-4, so top-10 overlap must be near-total and
    # the top hit (the query itself, cos 1.0) identical
    assert quant[0] == brute[0] == 0
    assert len(set(brute) & set(quant)) >= 8


def test_duplicate_span_fraction_closed_form(spark):
    """4-doc fixture with one shared 8-token span, one too-short doc and
    one fully unique doc — fractions are closed-form."""
    from linkgraph.pipeline.dedup import duplicate_span_fraction

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # 3 spans, span[0] shared with doc 2
            (2, "a b c d e f g h x y"),   # 3 spans, span[0] shared with doc 1
            (3, "z z z"),                 # < 8 tokens: zero spans
            (4, "eight totally unique words appear only here once"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_fraction"])
        for r in duplicate_span_fraction(docs, span_tokens=8).collect()
    }
    third = 1 / 3
    assert got == {
        1: (3, 1, third),
        2: (3, 1, third),
        3: (0, 0, 0.0),
        4: (1, 0, 0.0),
    }
    # a doc duplicated verbatim scores 1.0 against its copy
    twin = spark.createDataFrame(
        [(1, "a b c d e f g h i"), (2, "a b c d e f g h i")], ["doc_id", "text"]
    )
    out = duplicate_span_fraction(twin).collect()
    assert all(r["dup_fraction"] == 1.0 for r in out)
    import pytest as _pt

    with _pt.raises(ValueError):
        duplicate_span_fraction(docs, span_tokens=0)


def test_random_projection_deterministic_and_jl(spark):
    """Exact python-md5 replay of the sign function; determinism across
    runs; JL property: mean squared pairwise distance is approximately
    preserved going 32 -> 16 dims on random unit-ish vectors."""
    import hashlib
    import math
    import random

    import pytest as _pt

    from linkgraph.pipeline.similarity import random_projection

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, -0.5]), (1, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["projection"]
           for r in random_projection(emb, out_dim=4).collect()}

    def sign(j, d):
        return 1.0 if hashlib.md5(f"rp:{j}:{d}".encode()).hexdigest()[0] < "8" else -1.0

    for vid, vec in [(0, [1.0, 2.0, -0.5]), (1, [0.0, 0.0, 0.0])]:
        exp = [sum(sign(j, d) * x for d, x in enumerate(vec)) / 2.0
               for j in range(4)]
        assert got[vid] == _pt.approx(exp, abs=1e-12)

    rng = random.Random(5)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    proj = {r["vec_id"]: r["projection"]
            for r in random_projection(df, out_dim=16).collect()}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    orig = [d2(vecs[i][1], vecs[j][1])
            for i in range(30) for j in range(i + 1, 30)]
    prj = [d2(proj[i], proj[j]) for i in range(30) for j in range(i + 1, 30)]
    ratio = sum(prj) / sum(orig)
    assert 0.8 < ratio < 1.2  # JL: expected 1.0, k=16 concentration
    with _pt.raises(ValueError):
        random_projection(df, out_dim=0)


def test_cosine_topk_rejects_phantom_query(spark, emb):
    # round-5 review: a typo'd id must raise, not masquerade as an empty
    # result (the quantized_cosine_topk contract, now on all query paths)
    with pytest.raises(ValueError, match="matches no"):
        cosine_topk(emb, query_id=99999)
    with pytest.raises(ValueError, match="matches no"):
        lsh_cosine_topk(emb, query_id=99999)


def test_hyperplane_signature_empty_input(spark, emb):
    from linkgraph.pipeline.similarity import hyperplane_signature

    assert hyperplane_signature(emb.limit(0)).count() == 0


def test_random_projection_rejects_hostile_seed(spark, emb):
    from linkgraph.pipeline.similarity import random_projection

    with pytest.raises(ValueError, match="seed"):
        random_projection(emb, seed="a'b")
