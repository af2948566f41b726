"""BPE tokenizer training: merge learning vs a pure-python reference,
greedy-overlap semantics, segmentation round-trip, determinism guards."""

import pytest

from pyspark.sql import functions as F

from linkgraph.pipeline.text import bpe_segment, learn_bpe_merges


def _bpe_reference(word_counts, num_merges):
    """Pure-python replica of the documented semantics: overlapping pair
    counts weighted by word-type frequency; top pair by (count desc,
    left asc, right asc); greedy left-to-right non-overlapping apply."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(num_merges):
        pc = {}
        for w, cnt in word_counts.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + cnt
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, c))
        for w, s in seqs.items():
            ns = []
            for x in s:
                if ns and ns[-1] == l and x == r:
                    ns[-1] = l + r
                else:
                    ns.append(x)
            seqs[w] = ns
    return merges, seqs


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaaa": 2}


def _corpus(spark, word_counts):
    rows = [(" ".join([w] * c),) for w, c in word_counts.items()]
    return spark.createDataFrame(rows, ["text"])


def test_learn_bpe_merges_vs_reference(spark):
    got = [
        tuple(r)
        for r in learn_bpe_merges(_corpus(spark, SENNRICH), num_merges=6)
        .orderBy("rank")
        .collect()
    ]
    want, _ = _bpe_reference(SENNRICH, 6)
    assert got == want
    # sanity on the classic example: 'es' then 'est' lead
    assert got[0][1:3] == ("e", "s") and got[1][1:3] == ("es", "t")


def test_learn_bpe_merges_greedy_overlap(spark):
    # 'aaaa' under (a,a): pairs count 3 per word occurrence; the merged
    # symbol never re-merges within the round -> second round is (aa,aa)
    got = [
        tuple(r)
        for r in learn_bpe_merges(_corpus(spark, {"aaaa": 4}), num_merges=2)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(0, "a", "a", 12), (1, "aa", "aa", 4)]


def test_learn_bpe_merges_exhausts_and_filters(spark):
    # single-char words have no pairs; words failing the pattern drop out
    df = spark.createDataFrame([("a b c Mixed123 ab",)], ["text"])
    got = [
        tuple(r)
        for r in learn_bpe_merges(df, num_merges=5).orderBy("rank").collect()
    ]
    assert got == [(0, "a", "b", 1)]  # only 'ab' contributes one pair


def test_learn_bpe_merges_vocab_cap_is_deterministic(spark):
    # cap=1 keeps only the most frequent word type (ties by word asc)
    wc = {"bb": 3, "cc": 3, "dd": 5}
    got = [
        tuple(r)
        for r in learn_bpe_merges(_corpus(spark, wc), num_merges=1, vocab_cap=1)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(0, "d", "d", 5)]


def test_bpe_segment_round_trip(spark):
    corpus = _corpus(spark, SENNRICH)
    merges = learn_bpe_merges(corpus, num_merges=6)
    seg = bpe_segment(corpus, merges)
    _, seqs = _bpe_reference(SENNRICH, 6)
    for row in seg.select("text", "bpe_tokens").collect():
        words = row["text"].split()
        expect = [t for w in words for t in seqs[w]]
        assert row["bpe_tokens"] == expect
        # lossless: tokens concatenate back to the original words
        assert "".join(row["bpe_tokens"]) == "".join(words)


def test_bpe_segment_accepts_pair_list_and_guards(spark):
    df = spark.createDataFrame([("aaaa",)], ["text"])
    out = bpe_segment(df, [("a", "a"), ("aa", "aa")]).collect()[0]["bpe_tokens"]
    assert out == ["aaaa"]
    # the HOF kernel guards its expression-tree size (JVM-stack-bound:
    # overflow measured at 64 nested rounds); auto falls through to the
    # Arrow kernel above the guard (tested below)
    with pytest.raises(ValueError, match="33 merges"):
        bpe_segment(df, [("a", "a")] * 33, engine="hof")
    with pytest.raises(ValueError, match="engine"):
        bpe_segment(df, [("a", "a")], engine="gpu")
    with pytest.raises(ValueError, match="num_merges"):
        learn_bpe_merges(df, num_merges=0)


def test_arrow_kernel_parity_on_learned_table(spark):
    # VERDICT r4 task #3: the two kernels must agree symbol-for-symbol on
    # a learned (well-formed) merge table, nulls and empty text included.
    corpus = _corpus(spark, SENNRICH).unionByName(
        spark.createDataFrame([(None,), ("",), ("  \t\n",), ("zz !! mix3d oK",)], ["text"])
    )
    merges = learn_bpe_merges(_corpus(spark, SENNRICH), num_merges=6)
    def key(r):
        return (r["text"] is None, r["text"] or "")

    hof = bpe_segment(corpus, merges, engine="hof").collect()
    arrow = bpe_segment(corpus, merges, engine="arrow").collect()
    got_h = [(r["text"], r["bpe_tokens"]) for r in sorted(hof, key=key)]
    got_a = [(r["text"], r["bpe_tokens"]) for r in sorted(arrow, key=key)]
    assert got_h == got_a


def test_arrow_kernel_30k_merges(spark):
    # production-vocab scale: a well-formed 30k-merge table (chain merges
    # growing one 'a'-run per rank) segments without the HOF guard, via
    # auto fallthrough, with correct greedy semantics.
    n = 30_000
    merges = [("a", "a")] + [("a" * (k - 1), "a") for k in range(3, n + 2)]
    assert len(merges) == n
    df = spark.createDataFrame(
        [("aaaa aab b",), ("a" * 50,)], ["text"]
    )
    out = {
        r["text"]: r["bpe_tokens"]
        for r in bpe_segment(df, merges, word_pattern="^[ab]+$").collect()
    }
    # chain table: (a,a) then (aa,a) then (aaa,a)... greedy-by-rank:
    # aaaa: rank-0 (a,a) fuses non-overlapping pairs -> [aa, aa]; the
    # only remaining adjacency (aa,aa) is not in the table -> stop.
    # aab: (a,a) -> [aa, b]; (aa,b) absent -> stop. Sequential HOF
    # application agrees pass-for-pass on this well-formed chain.
    assert out["aaaa aab b"] == ["aa", "aa", "aa", "b", "b"]
    assert out["a" * 50] == ["aa"] * 25
    # parity with HOF on the full table is impossible (guard); parity at
    # the guard boundary of the same chain IS checkable:
    from linkgraph.pipeline.text import _HOF_MERGE_CAP

    small = merges[:_HOF_MERGE_CAP]
    hof = bpe_segment(df, small, engine="hof").collect()
    arrow = bpe_segment(df, small, engine="arrow").collect()
    assert sorted((r["text"], r["bpe_tokens"]) for r in hof) == sorted(
        (r["text"], r["bpe_tokens"]) for r in arrow
    )


def test_arrow_kernel_plan_is_one_map_in_pandas(spark):
    df = spark.createDataFrame([("abc",)], ["text"])
    plan = (
        bpe_segment(df, [("a", "b")], engine="arrow")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 1


def test_kernel_parity_unicode_whitespace_and_overwrite(spark):
    # Two auto-crossover hazards (round-5 review): (1) Python's Unicode \s
    # would split NBSP where Java's ASCII \s keeps it inside a (dropped)
    # word — kernels must agree on non-ASCII whitespace; (2) an existing
    # output column must be overwritten by BOTH kernels (withColumn
    # semantics), not raise only above the merge-count crossover.
    corpus = spark.createDataFrame(
        [("foo bar baz",), ("plain low er wide",)], ["text"]
    ).withColumn("bpe_tokens", F.array(F.lit("stale")))
    merges = [("l", "o"), ("lo", "w")]
    hof = bpe_segment(corpus, merges, engine="hof").collect()
    arrow = bpe_segment(corpus, merges, engine="arrow").collect()
    key = lambda r: r["text"]  # noqa: E731
    got_h = [(r["text"], r["bpe_tokens"]) for r in sorted(hof, key=key)]
    got_a = [(r["text"], r["bpe_tokens"]) for r in sorted(arrow, key=key)]
    assert got_h == got_a
    assert all("stale" not in t for _, t in got_h)
    # NBSP-joined 'foo bar' fails ^[a-z]+$ as ONE word → dropped;
    # 'baz' survives untouched
    nbsp_row = dict(got_h)["foo bar baz"]
    assert nbsp_row == ["b", "a", "z"]
