"""OHLC bar downsampling (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from databricks_demo_feature_store_spark.operators.timeseries import ohlc_bars


def _ticks(spark):
    d0 = dt.datetime(2024, 3, 1)
    rows = [
        # entity a, day 1: ordered prices 10 -> 30 -> 5 -> 20
        ("a", d0 + dt.timedelta(hours=1), 1, 10.0),
        ("a", d0 + dt.timedelta(hours=2), 2, 30.0),
        ("a", d0 + dt.timedelta(hours=3), 3, 5.0),
        ("a", d0 + dt.timedelta(hours=4), 4, 20.0),
        # entity a, day 2: equal timestamps — tie broken by id
        ("a", d0 + dt.timedelta(days=1, hours=1), 6, 99.0),
        ("a", d0 + dt.timedelta(days=1, hours=1), 5, 1.0),
        # entity b, day 1: single tick
        ("b", d0 + dt.timedelta(hours=5), 7, 42.0),
    ]
    return spark.createDataFrame(
        rows, "entity string, ts timestamp, tick_id long, price double"
    )


def _bars(spark):
    return {
        (r.entity, r.bar_start.date()): r
        for r in ohlc_bars(
            _ticks(spark), "entity", "ts", "price", tie_col="tick_id"
        ).collect()
    }


def test_ohlc_day_bar(spark):
    b = _bars(spark)[("a", dt.date(2024, 3, 1))]
    assert (b.open_value, b.high_value, b.low_value, b.close_value) == (
        10.0,
        30.0,
        5.0,
        20.0,
    )
    assert b.n_ticks == 4
    assert b.sum_value == 65.0
    assert b.mean_value == 65.0 / 4


def test_equal_timestamp_ties_break_on_tie_col(spark):
    b = _bars(spark)[("a", dt.date(2024, 3, 2))]
    # same ts: open = lower tick_id (5 -> 1.0), close = higher (6 -> 99.0)
    assert b.open_value == 1.0
    assert b.close_value == 99.0


def test_single_tick_bar_degenerate(spark):
    b = _bars(spark)[("b", dt.date(2024, 3, 1))]
    assert (
        b.open_value == b.high_value == b.low_value == b.close_value == 42.0
    )
    assert b.n_ticks == 1


def test_hourly_buckets(spark):
    out = ohlc_bars(
        _ticks(spark), "entity", "ts", "price", tie_col="tick_id", bucket="1 hour"
    )
    a_day1 = [
        r
        for r in out.collect()
        if r.entity == "a" and r.bar_start.date() == dt.date(2024, 3, 1)
    ]
    assert len(a_day1) == 4  # one bar per tick hour
    assert all(r.open_value == r.close_value for r in a_day1)


def test_deterministic_across_partitionings(spark):
    t = _ticks(spark)
    one = ohlc_bars(t.repartition(1), "entity", "ts", "price", tie_col="tick_id")
    many = ohlc_bars(t.repartition(5), "entity", "ts", "price", tie_col="tick_id")
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_stream_ohlc_equals_batch(spark, tmp_path):
    """Streamed bars (availableNow over a file source, two partitions so
    micro-batch order is nontrivial) ≡ the batch operator bit-for-bit."""
    from databricks_demo_feature_store_spark.streaming.ops import (
        ohlc_bars_stream,
        run_available_now,
    )

    ticks = _ticks(spark).withColumnRenamed("entity", "user_id").withColumnRenamed(
        "tick_id", "event_id"
    ).withColumnRenamed("price", "value")
    src = str(tmp_path / "ticks")
    ticks.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(ticks.schema).parquet(src)
    streamed = run_available_now(
        ohlc_bars_stream(stream, bucket="1 day")
    )
    batch = ohlc_bars(
        spark.read.parquet(src), "user_id", "ts", "value", tie_col="event_id"
    )
    s = sorted(map(tuple, streamed.select(*batch.columns).collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b


def test_merge_daily_to_weekly_equals_direct(spark):
    """OHLC merge monoid: merged(daily -> weekly) == weekly-from-raw."""
    from databricks_demo_feature_store_spark.operators.timeseries import (
        merge_ohlc_bars,
    )

    t = _ticks(spark)
    daily = ohlc_bars(t, "entity", "ts", "price", tie_col="tick_id")
    merged = merge_ohlc_bars(daily, "entity", bucket="7 days")
    direct = ohlc_bars(t, "entity", "ts", "price", tie_col="tick_id", bucket="7 days")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
