"""Tests for corpus-cleaning operators (PII redaction, C4 line filter,
deterministic shuffle shards)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from databricks_demo_feature_store_spark.textops.cleaning import (
    clean_lines,
    scrub_pii,
    shuffle_shards,
)


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            Row(
                id=1,
                text=(
                    "Write to jane.doe+x@corp.example.org or 10.1.2.3, "
                    "ssn 987-65-4320, call 555-867-5309, card 4111111111111111."
                ),
            ),
            Row(id=2, text="no pii here at all"),
            Row(id=3, text="two mails: a@b.io c@d.co and ips 1.2.3.4 5.6.7.8"),
        ]
    )
    out = {r["id"]: r for r in scrub_pii(df, "text").collect()}
    t1 = out[1]["text"]
    assert "<EMAIL>" in t1 and "<IP>" in t1 and "<SSN>" in t1
    assert "<PHONE>" in t1 and "<CARD>" in t1
    assert "jane.doe" not in t1 and "4111" not in t1
    assert out[1]["pii_total"] == 5
    assert out[2]["text"] == "no pii here at all" and out[2]["pii_total"] == 0
    assert out[3]["pii_email"] == 2 and out[3]["pii_ip"] == 2


def test_scrub_pii_keeps_other_columns_and_order(spark):
    df = spark.createDataFrame([Row(id=7, text="x@y.zz", extra="keep")])
    row = scrub_pii(df, "text").collect()[0]
    assert row["extra"] == "keep" and row["text"] == "<EMAIL>"


def test_clean_lines_predicates(spark):
    text = "\n".join(
        [
            "This line is long enough and ends well.",  # kept
            "Enable JavaScript to view this site.",  # blacklist
            "too short",  # < 3 words + no terminal punct
            "var config = { a: 1 }",  # brace
            "Another perfectly good sentence here!",  # kept
            "no terminal punctuation on this one",  # no terminal punct
        ]
    )
    df = spark.createDataFrame([Row(id=1, text=text)])
    row = clean_lines(df, "text").collect()[0]
    kept = row["text"].split("\n")
    assert kept == [
        "This line is long enough and ends well.",
        "Another perfectly good sentence here!",
    ]
    assert row["lines_total"] == 6 and row["lines_kept"] == 2


def test_clean_lines_relaxed_punct(spark):
    df = spark.createDataFrame([Row(id=1, text="three plain words\ngood line here.")])
    row = clean_lines(df, "text", require_terminal_punct=False).collect()[0]
    assert row["lines_kept"] == 2


def test_shuffle_shards_deterministic_partition(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    a = shuffle_shards(df, "k", n_shards=4, seed=9)
    b = shuffle_shards(df, "k", n_shards=4, seed=9)
    pa = {(r["k"]): (r["shard"], r["pos"]) for r in a.collect()}
    pb = {(r["k"]): (r["shard"], r["pos"]) for r in b.collect()}
    assert pa == pb  # reproducible across runs
    shards = {}
    for shard, pos in pa.values():
        shards.setdefault(shard, []).append(pos)
    assert set(shards) == {0, 1, 2, 3}
    for positions in shards.values():
        # dense 0..n-1 within each shard
        assert sorted(positions) == list(range(len(positions)))
    # a different seed produces a different permutation
    c = shuffle_shards(df, "k", n_shards=4, seed=10)
    pc = {(r["k"]): (r["shard"], r["pos"]) for r in c.collect()}
    assert pc != pa


def test_shuffle_shards_rejects_bad_nshards(spark):
    import pytest

    df = spark.range(3)
    with pytest.raises(ValueError):
        shuffle_shards(df, "id", n_shards=0)
