"""Distributed BPE tokenizer induction + encoding — the tokenizer-training
step of an LLM data pipeline (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"), built Spark-first.

Why this scales to 100 TB:
- The corpus is touched ONCE: a word-frequency aggregation (map-side
  combinable hash agg). Everything iterative runs on the DISTINCT-WORD
  table, whose size is vocabulary-bounded (~10M rows for web-scale text)
  and INDEPENDENT of corpus size — 1000× more data grows the counts, not
  the loop's working set.
- Each merge round is one hash aggregation over that word table (pair
  counts weighted by word frequency) + one narrow per-row array rewrite.
  The winning pair is a 1-row collect (BPE is inherently sequential in
  the merge rank — the round-synchronous driver loop is the PageRank /
  Lloyd discipline, with the same ``localCheckpoint`` lineage truncation).
- Encoding broadcasts the learned merge ranking and rewrites each word
  independently — an Arrow-batched pandas iterator (the deliberate
  Python boundary: rank-ordered merge application is a per-word
  sequential fold no fixed-depth column expression can express), with a
  distinct-word pre-aggregation so each unique word is encoded ONCE per
  partition batch, not once per occurrence.

Determinism: ties in pair counts break lexicographically on (left,
right), so the learned merge sequence is a pure function of the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["learn_bpe_merges", "bpe_encode", "bpe_word_table"]

# end-of-word sentinel (classic BPE): lets merges distinguish suffixes
# from mid-word sequences and makes detokenization exact
EOW = "▁"  # LOWER ONE EIGHTH BLOCK, the sentencepiece-style marker


def bpe_word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, weight) frequency table — the ONLY corpus-sized pass.

    Words are lowercased whitespace tokens with the end-of-word sentinel
    appended; ``weight`` is the corpus occurrence count.
    """
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .withColumn("word", F.concat(F.col("word"), F.lit(EOW)))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def _apply_merge(symbols_col, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) symbol pairs —
    a fold over the symbol array (SQL ``aggregate``), no Python."""
    merged = left + right
    return F.aggregate(
        symbols_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    min_count: int = 2,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus; returns them in
    rank order. Stops early when no pair reaches ``min_count``.

    Round cost: one pair-count aggregation + one array rewrite over the
    word-frequency table (vocab-bounded); the corpus itself is scanned
    exactly once by :func:`bpe_word_table`.
    """
    spark = docs.sparkSession
    # split "(?!$)" breaks between every character, so the appended
    # sentinel arrives as its own single-char symbol — the classic
    # char + </w> initial alphabet
    words = (
        bpe_word_table(docs, text_col)
        .select("weight", F.split(F.col("word"), "(?!$)").alias("symbols"))
        .localCheckpoint(eager=True)
    )

    merges: list[tuple[str, str]] = []
    for rank in range(n_merges):
        pairs = (
            words.select(
                "weight",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                        F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("weight").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        words = words.select(
            "weight", _apply_merge(F.col("symbols"), left, right).alias("symbols")
        )
        if (rank + 1) % checkpoint_every == 0:
            # truncate the per-round plan growth (PageRank discipline)
            words = words.localCheckpoint(eager=True)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge ranking; appends
    ``out_col`` (array<string> of subword tokens, end-of-word sentinel
    kept so ``concat(tokens)`` reconstructs the lowercased words exactly).

    Arrow-batched ``mapInPandas`` with the merge ranking shipped in the
    closure (rank-ordered merge application is a sequential per-word fold
    — the documented deliberate Python boundary). Each batch encodes each
    DISTINCT word once via a memo, so hot words cost one encode per batch
    regardless of frequency.
    """
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    ) + f", {out_col} array<string>"
    text_name = text_col
    eow = EOW

    def _encode_batches(batches: Iterator) -> Iterator:
        # nested closure: cloudpickle ships it (and the ranks dict) by
        # value — workers never import this package
        def encode_word(word: str, memo: dict) -> list[str]:
            got = memo.get(word)
            if got is not None:
                return got
            syms = list(word) + [eow]
            while len(syms) > 1:
                best = None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best[0]):
                        best = (r, i)
                if best is None:
                    break
                left, right = ranks_inv[best[0]]
                out = []
                i = 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        out.append(left + right)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[word] = syms
            return syms

        import re as _re

        # Mirror training's tokenization EXACTLY: bpe_word_table splits on
        # Spark/Java \s+ — which is only [ \t\n\x0b\f\r], NOT Python
        # str.split()'s full Unicode whitespace. A U+00A0 (say) must stay
        # inside the word here just as it did in the word table the merges
        # were learned from, or concat(tokens) stops reconstructing the
        # text and the cross-engine roundtrip hash breaks.
        _java_ws = _re.compile(r"[ \t\n\x0b\f\r]+")
        ranks_inv = {i: m for m, i in ranks.items()}
        for pdf in batches:
            memo: dict = {}
            toks = []
            for text in pdf[text_name]:
                row_tokens: list[str] = []
                for w in _java_ws.split((text or "").lower()):
                    if w:
                        row_tokens.extend(encode_word(w, memo))
                toks.append(row_tokens)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return docs.mapInPandas(_encode_batches, schema=out_schema)
