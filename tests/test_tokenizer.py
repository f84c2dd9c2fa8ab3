"""BPE tokenizer induction: the distributed learner pinned against a
pure-Python Sennrich-style reference on the same corpus, plus encode
properties (round-trip losslessness, monotone compression)."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from databricks_demo_feature_store_spark.queries import load
from databricks_demo_feature_store_spark.textops.tokenizer import (
    EOW,
    bpe_encode,
    bpe_word_table,
    learn_bpe_merges,
)

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_freqs: dict[str, int], n_merges: int, min_count: int):
    """Pure-Python BPE learner (Sennrich et al. 2016 pseudo-code), same
    tie-break: max count, then lexicographic (left, right)."""
    vocab = {tuple(list(w) + [EOW]): c for w, c in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if best[1] < min_count:
            break
        (left, right), _cnt = best
        merges.append((left, right))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = c
        vocab = new_vocab
    return merges


def _word_freqs(spark):
    docs = load(spark, SF, "documents")
    rows = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    return {r["w"]: r["count"] for r in rows}


def test_learner_matches_python_reference(spark):
    docs = load(spark, SF, "documents")
    got = learn_bpe_merges(docs, n_merges=15, min_count=2, checkpoint_every=5)
    want = _reference_bpe(_word_freqs(spark), n_merges=15, min_count=2)
    assert got == want


def test_word_table_weights_exact(spark):
    docs = load(spark, SF, "documents")
    wt = {r["word"]: r["weight"] for r in bpe_word_table(docs).collect()}
    ref = _word_freqs(spark)
    assert wt == {w + EOW: c for w, c in ref.items()}


def test_encode_roundtrip_and_compression(spark):
    docs = load(spark, SF, "documents")
    merges = learn_bpe_merges(docs, n_merges=12, checkpoint_every=6)
    enc = bpe_encode(docs, merges)
    recon_bad = (
        enc.select(
            F.regexp_replace(F.concat_ws("", "tokens"), EOW, "").alias("recon"),
            F.concat_ws("", F.split(F.lower("text"), r"\s+")).alias("orig"),
        )
        .filter(F.col("recon") != F.col("orig"))
        .count()
    )
    assert recon_bad == 0
    # every merge rule monotonically shrinks the corpus token count, and
    # the final count must beat the char-level baseline
    n_tokens_full = enc.select(F.sum(F.size("tokens"))).collect()[0][0]
    n_tokens_none = bpe_encode(docs, []).select(F.sum(F.size("tokens"))).collect()[0][0]
    assert n_tokens_full < n_tokens_none
    # token vocabulary is bounded by alphabet + one new symbol per merge
    alpha = (
        bpe_encode(docs, [])
        .select(F.explode("tokens").alias("t"))
        .distinct()
        .count()
    )
    vocab = enc.select(F.explode("tokens").alias("t")).distinct().count()
    assert vocab <= alpha + len(merges)


def test_encode_applies_merges_in_rank_order(spark):
    # overlapping rules: the LOWER rank must fire first and consume its
    # symbols, blocking the other — ("a","b") first gives [ab, c], while
    # ("b","c") first gives [a, bc]
    docs = spark.createDataFrame([("abc",)], "text string")
    enc1 = bpe_encode(docs, [("a", "b"), ("b", "c")]).collect()[0]["tokens"]
    assert enc1 == ["ab", "c", EOW]
    enc2 = bpe_encode(docs, [("b", "c"), ("a", "b")]).collect()[0]["tokens"]
    assert enc2 == ["a", "bc", EOW]


def test_encode_split_mirrors_training_on_unicode_whitespace(spark):
    """ADVICE r11: training splits on Java \\s+ ([ \\t\\n\\x0b\\f\\r]); the
    encode closure must use the SAME splitter, not Python str.split()'s
    full Unicode whitespace — U+00A0 stays inside a word on both sides so
    concat(tokens) keeps reconstructing the word table's words."""
    docs = spark.createDataFrame(
        [(1, "foo bar baz"), (2, "a b c"), (3, "plain text")],
        "id long, text string",
    )
    # training sees "foo bar" as ONE word
    words = {r.word for r in bpe_word_table(docs).collect()}
    assert ("foo bar" + EOW) in words
    # encode must reconstruct exactly the Java-split lowercased words
    enc = bpe_encode(docs, learn_bpe_merges(docs, n_merges=4))
    bad = (
        enc.select(
            F.regexp_replace(F.concat_ws("", "tokens"), EOW, "").alias("recon"),
            F.concat_ws("", F.split(F.lower("text"), r"\s+")).alias("orig"),
        )
        .filter(F.col("recon") != F.col("orig"))
        .count()
    )
    assert bad == 0
