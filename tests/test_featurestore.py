"""Feature-store manager: save modes, schema evolution, PIT training set."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from databricks_demo_feature_store_spark.featurestore import (
    EvolutionPolicy,
    FeatureStoreManager,
    FeatureTableSpec,
    create_training_set,
)
from databricks_demo_feature_store_spark.featurestore.training import FeatureLookup


@pytest.fixture()
def manager(spark, tmp_path):
    return FeatureStoreManager(spark, str(tmp_path / "fs"))


SPEC = FeatureTableSpec(
    name="cust_features",
    primary_keys=("pk_customer", "tpk_release_dt"),
    timestamp_keys=("tpk_release_dt",),
    description="test table",
    source_tables=("orders",),
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk_customer int, tpk_release_dt date, f1 double")


def test_save_and_metadata_roundtrip(spark, manager):
    df = _df(spark, [(1, dt.date(2024, 1, 1), 1.0)])
    diff = manager.save(df, SPEC, mode="overwrite")
    assert diff.unchanged
    meta = manager.get_metadata("cust_features")
    assert meta["primary_keys"] == ["pk_customer", "tpk_release_dt"]
    assert meta["timestamp_keys"] == ["tpk_release_dt"]
    assert manager.list_tables() == ["cust_features"]
    assert manager.read("cust_features").count() == 1


def test_merge_upserts_on_pk(spark, manager):
    manager.save(_df(spark, [(1, dt.date(2024, 1, 1), 1.0), (2, dt.date(2024, 1, 1), 2.0)]), SPEC, mode="overwrite")
    manager.save(_df(spark, [(2, dt.date(2024, 1, 1), 20.0), (3, dt.date(2024, 1, 1), 3.0)]), SPEC, mode="merge")
    got = {
        (r.pk_customer, r.f1)
        for r in manager.read("cust_features").collect()
    }
    assert got == {(1, 1.0), (2, 20.0), (3, 3.0)}


def test_merge_new_column_evolution(spark, manager):
    manager.save(_df(spark, [(1, dt.date(2024, 1, 1), 1.0)]), SPEC, mode="overwrite")
    wide = _df(spark, [(1, dt.date(2024, 1, 1), 99.0)]).withColumn("f2", F.lit(7.0))
    diff = manager.save(wide, SPEC, mode="merge")
    assert diff.new_columns == ["f2"]
    row = manager.read("cust_features").first()
    # reference semantics (utils.py:1748-1758): merge restricted to the NEW
    # columns for matched rows — f1 keeps its old value, f2 arrives
    assert row.f1 == 1.0 and row.f2 == 7.0


def test_missing_column_policy(spark, manager):
    manager.save(_df(spark, [(1, dt.date(2024, 1, 1), 1.0)]), SPEC, mode="overwrite")
    narrow = _df(spark, [(1, dt.date(2024, 1, 1), 5.0)]).drop("f1").withColumn("f1b", F.lit(1.0))
    with pytest.raises(ValueError, match="policy=fail"):
        manager.save(narrow, SPEC, mode="merge", policy=EvolutionPolicy.FAIL)
    diff = manager.save(narrow, SPEC, mode="merge", policy=EvolutionPolicy.EVOLVE)
    assert "f1" in diff.missing_columns
    assert set(manager.read("cust_features").columns) == {"pk_customer", "tpk_release_dt", "f1b"}


def test_create_training_set_pit(spark, manager):
    feats = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1), 10.0),
            (1, dt.date(2024, 2, 1), 20.0),
        ],
        "pk_customer int, tpk_release_dt date, f1 double",
    )
    manager.save(feats, SPEC, mode="overwrite")
    labels = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 15), 1),
            (1, dt.date(2024, 3, 1), 0),
            (2, dt.date(2024, 3, 1), 1),
        ],
        "pk_customer int, label_dt date, y int",
    )
    ts = create_training_set(
        manager,
        labels,
        [FeatureLookup(table="cust_features", lookup_keys=("pk_customer",))],
        spine_time="label_dt",
    )
    got = {(r.pk_customer, r.label_dt, r.y, r.f1) for r in ts.collect()}
    assert got == {
        (1, dt.date(2024, 1, 15), 1, 10.0),
        (1, dt.date(2024, 3, 1), 0, 20.0),
        (2, dt.date(2024, 3, 1), 1, None),
    }


def test_bucketed_join_has_no_exchange(spark):
    from pyspark.sql import functions as F

    from databricks_demo_feature_store_spark.sources.bucketing import (
        bucketed_join,
        save_bucketed,
    )

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_acctbal"
    )
    save_bucketed(orders, "b_orders", ["o_custkey"], num_buckets=8)
    save_bucketed(customer, "b_customer", ["o_custkey"], num_buckets=8)
    try:
        joined = bucketed_join(spark, "b_orders", "b_customer", on=["o_custkey"])
        # disable broadcast so the co-located SortMergeJoin is observable
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # both sides pre-bucketed: no shuffle
            n = joined.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        plain = orders.join(customer, on="o_custkey").count()
        assert n == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_manager_recovers_from_empty_table_dir(spark, tmp_path):
    """A bare table directory (crashed writer debris / metadata-before-data)
    must read as absent so the next save recreates it instead of dying in
    schema validation on an unreadable empty dir."""
    import os

    from databricks_demo_feature_store_spark.featurestore.manager import (
        FeatureStoreManager,
        FeatureTableSpec,
    )

    mgr = FeatureStoreManager(spark, str(tmp_path))
    os.makedirs(mgr.path("t"), exist_ok=True)
    assert not mgr.exists("t")
    spec = FeatureTableSpec(name="t", primary_keys=("id",))
    mgr.save(spark.range(3).select("id"), spec, mode="merge")
    assert mgr.exists("t")
    assert mgr.read("t").count() == 3


def test_latest_features_snapshot(spark):
    """latest_features returns one row per entity — the newest at or
    before as_of; entities with no history before the cutoff drop out."""
    import datetime as dt

    from databricks_demo_feature_store_spark.featurestore.training import (
        latest_features,
    )

    rows = [
        (1, dt.datetime(2024, 1, 1), 10.0),
        (1, dt.datetime(2024, 2, 1), 20.0),
        (1, dt.datetime(2024, 3, 1), 30.0),
        (2, dt.datetime(2024, 2, 15), 5.0),
        (3, dt.datetime(2024, 3, 20), 7.0),  # after the cutoff
    ]
    df = spark.createDataFrame(rows, ["custkey", "release_dt", "spend"])

    latest = {
        r["custkey"]: (r["release_dt"], r["spend"])
        for r in latest_features(df, ("custkey", "release_dt"), "release_dt").collect()
    }
    assert latest[1] == (dt.datetime(2024, 3, 1), 30.0)
    assert latest[3] == (dt.datetime(2024, 3, 20), 7.0)

    snap = {
        r["custkey"]: (r["release_dt"], r["spend"])
        for r in latest_features(
            df, ("custkey", "release_dt"), "release_dt", as_of="2024-02-20"
        ).collect()
    }
    assert snap[1] == (dt.datetime(2024, 2, 1), 20.0)
    assert snap[2] == (dt.datetime(2024, 2, 15), 5.0)
    assert 3 not in snap


def test_multi_lookup_pit_matches_sequential(spark, manager):
    """The one-shuffle multi-table PIT join must be value-identical to
    the sequential chain on every edge: ties (feature at the spine
    instant wins), unmatched spine rows (NULL features), per-lookup
    tolerance null-out, and tables with different release cadences."""
    f_a = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1), 10.0),
            (1, dt.date(2024, 2, 1), 20.0),
            (2, dt.date(2024, 2, 15), 5.0),  # exactly at a spine instant
        ],
        "pk_customer int, tpk_release_dt date, fa double",
    )
    f_b = spark.createDataFrame(
        [
            (1, dt.date(2023, 1, 1), 100),  # stale: killed by tolerance
            (2, dt.date(2024, 2, 10), 200),
        ],
        "pk_customer int, tpk_release_dt date, fb int",
    )
    for name, frame in (("tbl_a", f_a), ("tbl_b", f_b)):
        manager.save(
            frame,
            FeatureTableSpec(
                name=name,
                primary_keys=("pk_customer", "tpk_release_dt"),
                timestamp_keys=("tpk_release_dt",),
            ),
            mode="overwrite",
        )
    labels = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 15), 1),
            (1, dt.date(2024, 3, 1), 0),
            (2, dt.date(2024, 2, 15), 1),  # tie with f_a's release
            (3, dt.date(2024, 3, 1), 0),   # no history anywhere
        ],
        "pk_customer int, label_dt date, y int",
    )
    lookups = [
        FeatureLookup(table="tbl_a", lookup_keys=("pk_customer",)),
        FeatureLookup(
            table="tbl_b",
            lookup_keys=("pk_customer",),
            tolerance="INTERVAL 90 DAYS",
        ),
    ]

    def rows(strategy):
        out = create_training_set(
            manager, labels, lookups, spine_time="label_dt", strategy=strategy
        )
        return {
            tuple(r[c] for c in sorted(out.columns)) for r in out.collect()
        }

    multi = rows("multi")
    seq = rows("sequential")
    assert multi == seq
    # spot-check the semantics directly (fa, fb) per (customer, label_dt)
    by_key = {}
    out = create_training_set(
        manager, labels, lookups, spine_time="label_dt", strategy="multi"
    )
    for r in out.collect():
        by_key[(r["pk_customer"], str(r["label_dt"]))] = (r["fa"], r["fb"])
    assert by_key[(1, "2024-01-15")] == (10.0, None)   # fb stale → tolerance NULL
    assert by_key[(1, "2024-03-01")] == (20.0, None)
    assert by_key[(2, "2024-02-15")] == (5.0, 200)     # tie resolves to feature
    assert by_key[(3, "2024-03-01")] == (None, None)   # unmatched spine survives


def test_negative_samples_properties(spark):
    """Negatives never collide with positives, at most k per user,
    deterministic across invocations, and a user whose universe is
    mostly positive yields fewer than k rather than looping."""
    from databricks_demo_feature_store_spark.featurestore.training import (
        negative_samples,
    )

    inter = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (3, 10), (3, 11), (3, 12), (3, 13)],
        "u long, it long",
    )
    items = spark.createDataFrame([(i,) for i in (10, 11, 12, 13, 14)], "it long")

    def run():
        return {(r["u"], r["it"], r["slot"]) for r in
                negative_samples(inter, "u", "it", items, k=2,
                                 oversample=8).collect()}

    got = run()
    pos = {(1, 10), (1, 11), (2, 10), (3, 10), (3, 11), (3, 12), (3, 13)}
    assert not {(u, i) for u, i, _ in got} & pos
    per_user = {}
    for u, i, _ in got:
        per_user.setdefault(u, set()).add(i)
    assert all(len(v) <= 2 for v in per_user.values())
    assert len(per_user[1]) == 2 and len(per_user[2]) == 2
    # user 3 has 4/5 items positive: only item 14 can ever be drawn
    assert per_user[3] == {14}
    assert run() == got  # deterministic replay

    import pytest as _p
    with _p.raises(ValueError, match="k >= 1"):
        negative_samples(inter, "u", "it", items, k=0)


def test_refresh_training_set_touches_only_changed_entities(spark):
    """The refresh must (a) recompute changed entities against v2 and
    (b) pass untouched entities' OLD rows through verbatim — proven by
    planting a sentinel in the old training frame for an unchanged
    entity: a lazy full recompute would 'fix' it, the incremental path
    must preserve it."""
    from databricks_demo_feature_store_spark.featurestore.training import (
        refresh_training_set,
    )

    f_old = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 10.0), (2, dt.datetime(2024, 1, 1), 20.0)],
        "k long, ft timestamp, v double",
    )
    # v2: entity 1's history changes, entity 2 untouched
    f_new = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 99.0), (2, dt.datetime(2024, 1, 1), 20.0)],
        "k long, ft timestamp, v double",
    )
    spine = spark.createDataFrame(
        [(1, dt.datetime(2024, 2, 1), 100), (2, dt.datetime(2024, 2, 1), 200)],
        "k long, ts timestamp, label int",
    )
    # old training with a SENTINEL for entity 2 (not what a recompute
    # would produce) — must survive the refresh untouched
    old_training = spark.createDataFrame(
        [(1, dt.datetime(2024, 2, 1), 100, 10.0),
         (2, dt.datetime(2024, 2, 1), 200, -777.0)],
        "k long, ts timestamp, label int, v double",
    )
    got = {r["k"]: r["v"] for r in refresh_training_set(
        spine, old_training, f_old, f_new,
        keys=["k"], spine_time="ts", feature_time="ft",
    ).collect()}
    assert got[1] == 99.0    # changed entity recomputed against v2
    assert got[2] == -777.0  # unchanged entity: old row verbatim


def test_store_doctor_flags_pk_violations(spark, manager):
    """One audit row per table: duplicate-PK groups counted (not rows),
    NULL key components counted separately, freshness from the declared
    timestamp key, NULL max_ts when no timestamp key is declared."""
    from databricks_demo_feature_store_spark.featurestore.manager import (
        store_doctor,
    )

    good = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 1.0), (2, dt.date(2024, 1, 1), 2.0)],
        "pk_customer int, tpk_release_dt date, f1 double",
    )
    manager.save(good, SPEC, mode="overwrite")
    bad = spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (1, 12.0), (2, 20.0), (None, 30.0)],
        "k int, v double",
    )
    manager.save(
        bad,
        FeatureTableSpec(name="dirty", primary_keys=("k",)),
        mode="overwrite",
    )
    got = {r["table"]: r for r in store_doctor(manager).collect()}
    g = got["cust_features"]
    assert (g["n_rows"], g["n_pk_violations"], g["n_null_pk"]) == (2, 0, 0)
    assert g["max_ts"] is not None
    d = got["dirty"]
    # k=1 appears 3x -> ONE violating group; NULL key row counted once
    assert (d["n_rows"], d["n_pk_violations"], d["n_null_pk"]) == (5, 1, 1)
    assert d["max_ts"] is None  # no timestamp key declared


def test_training_set_payload_collisions_raise_every_strategy(spark, manager):
    """A feature column colliding with the spine's columns or with another
    lookup must raise up front under EVERY strategy — the sequential chain
    would otherwise emit duplicate output column names (an ambiguous
    frame), not a usable result."""
    import pytest

    f_a = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 10.0)],
        "pk_customer int, tpk_release_dt date, f1 double",
    )
    f_b = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 7.0)],
        "pk_customer int, tpk_release_dt date, f1 double",  # collides with f_a
    )
    for name, frame in (("coll_a", f_a), ("coll_b", f_b)):
        manager.save(
            frame,
            FeatureTableSpec(
                name=name,
                primary_keys=("pk_customer", "tpk_release_dt"),
                timestamp_keys=("tpk_release_dt",),
            ),
            mode="overwrite",
        )
    labels = spark.createDataFrame(
        [(1, dt.date(2024, 2, 1), 1)], "pk_customer int, label_dt date, y int"
    )
    lookups = [
        FeatureLookup(table="coll_a", lookup_keys=("pk_customer",)),
        FeatureLookup(table="coll_b", lookup_keys=("pk_customer",)),
    ]
    for strategy in ("auto", "sequential", "multi"):
        with pytest.raises(ValueError, match="collides"):
            create_training_set(
                manager, labels, lookups, spine_time="label_dt", strategy=strategy
            )
    # collision with a SPINE column (the label itself) raises too
    spine_coll = [
        FeatureLookup(table="coll_a", lookup_keys=("pk_customer",),
                      feature_names=("f1",)),
    ]
    labels_y = labels.withColumnRenamed("y", "f1")
    for strategy in ("auto", "sequential"):
        with pytest.raises(ValueError, match="collides"):
            create_training_set(
                manager, labels_y, spine_coll, spine_time="label_dt",
                strategy=strategy,
            )


def test_multi_join_rejects_spine_column_collision(spark):
    """point_in_time_multi_join validates payload names against the
    spine's own columns and keys, not just across lookups."""
    import pytest

    from databricks_demo_feature_store_spark.operators.joins import (
        point_in_time_multi_join,
    )

    spine = spark.createDataFrame(
        [(1, dt.date(2024, 2, 1), 1)], "k int, ts date, y int"
    )
    feats = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), 5.0)], "k int, ft date, y double"
    )
    with pytest.raises(ValueError, match="collide"):
        point_in_time_multi_join(
            spine,
            [{"features": feats, "feature_time": "ft"}],
            keys=["k"],
            spine_time="ts",
        )


def test_aggregate_state_merge_is_exact(spark):
    """merge(state(A), state(B)) == state(A ∪ B) bit-for-bit, in any
    split and association order — the monoid property the incremental
    refresh relies on."""
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        aggregate_state,
        finalize_aggregates,
        merge_aggregate_state,
    )

    rows = [(i % 7, float(i) * 1.37 + (i % 3) * 0.01) for i in range(200)]
    df = spark.createDataFrame(rows, "k int, v double")
    full = aggregate_state(df, ["k"], "v")

    a = df.where(F.col("v") < 100)
    b = df.where((F.col("v") >= 100) & (F.col("v") < 200))
    c = df.where(F.col("v") >= 200)
    m_ab_c = merge_aggregate_state(
        merge_aggregate_state(
            aggregate_state(a, ["k"], "v"), aggregate_state(b, ["k"], "v"), ["k"]
        ),
        aggregate_state(c, ["k"], "v"),
        ["k"],
    )
    m_a_bc = merge_aggregate_state(
        aggregate_state(a, ["k"], "v"),
        merge_aggregate_state(
            aggregate_state(b, ["k"], "v"), aggregate_state(c, ["k"], "v"), ["k"]
        ),
        ["k"],
    )

    def rows_of(state):
        return sorted((r.k, r.n, r.s, r.s2) for r in state.collect())

    assert rows_of(full) == rows_of(m_ab_c) == rows_of(m_a_bc)

    fin = {
        r.k: (r.spend_count, r.spend_sum, r.spend_mean, r.spend_std)
        for r in finalize_aggregates(m_ab_c, ["k"], "spend").collect()
    }
    fin_full = {
        r.k: (r.spend_count, r.spend_sum, r.spend_mean, r.spend_std)
        for r in finalize_aggregates(full, ["k"], "spend").collect()
    }
    assert fin == fin_full
    # a constant-valued key must finalize to std exactly 0.0, not NaN
    const = aggregate_state(
        spark.createDataFrame([(9, 5.0), (9, 5.0)], "k int, v double"), ["k"], "v"
    )
    out = finalize_aggregates(const, ["k"], "x").collect()[0]
    assert out.x_std == 0.0 and out.x_mean == 5.0


def test_fused_moment_histogram_state_matches_join_form(spark):
    """aggregate_state(hist=...) — one hash aggregation — is value- and
    column-order-identical to the old two-agg-plus-join shape the
    round-14 optimization replaced in stream_trailing_state."""
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        aggregate_state,
        histogram_state,
    )

    rows = [
        (i % 5, float(i * 7 % 40) - 3.0 if i % 11 else None) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "k int, v double")
    lo, hi, nbins = 0.0, 30.0, 8
    fused = aggregate_state(df, ["k"], "v", scale=2, hist=(lo, hi, nbins))
    joined = aggregate_state(df, ["k"], "v", scale=2).join(
        histogram_state(df, ["k"], "v", lo, hi, nbins), on=["k"]
    )
    assert fused.columns == joined.columns
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, joined.collect())
    )


def test_window_lookup_collision_and_mixing(spark, manager):
    """WindowLookup output names join the collision validation, and a
    windowed training set with NO as-of lookups still assembles."""
    events = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 10), 10.0),
            (1, dt.datetime(2024, 2, 10), 20.0),
        ],
        "pk_customer int, tpk_event_ts timestamp, amount double",
    )
    manager.save(
        events,
        FeatureTableSpec(
            name="evt",
            primary_keys=("pk_customer", "tpk_event_ts"),
            timestamp_keys=("tpk_event_ts",),
        ),
        mode="overwrite",
    )
    from databricks_demo_feature_store_spark.featurestore.training import (
        WindowLookup,
    )

    labels = spark.createDataFrame(
        [(1, dt.datetime(2024, 2, 15), 1), (2, dt.datetime(2024, 2, 15), 0)],
        "pk_customer int, label_dt timestamp, y int",
    )
    wl = WindowLookup(
        table="evt",
        lookup_keys=("pk_customer",),
        windows=(("30d", "INTERVAL 30 DAYS"),),
        sum_cols=(("spend", "amount"),),
        count_col="n",
    )
    out = create_training_set(manager, labels, [wl], spine_time="label_dt")
    got = {r.pk_customer: (r.spend_30d, r.n_30d) for r in out.collect()}
    assert got == {1: (20.0, 1), 2: (0.0, 0)}

    # a window output name colliding with a spine column raises up front:
    # sum name "y" + suffix "30d" would be fine, but naming the output
    # after the spine's label column collides as "y_30d" vs spine "y_30d"
    labels_coll = labels.withColumn("spend_30d", F.lit(0.0))
    with pytest.raises(ValueError, match="collides"):
        create_training_set(manager, labels_coll, [wl], spine_time="label_dt")


def test_histogram_state_merge_and_quantiles(spark):
    """Bin counts merge exactly (monoid); the histogram-quantile
    estimator is exact given the bins; clamping puts out-of-range
    values in the edge bins; empty keys give NULL quantiles."""
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        histogram_state,
        merge_histogram_state,
        quantile_from_hist,
    )
    import pytest as _pytest

    a = spark.createDataFrame(
        [(1, v) for v in (0.0, 1.0, 2.0, 3.0)] + [(2, -5.0)],
        "k int, v double",
    )
    b = spark.createDataFrame(
        [(1, v) for v in (4.0, 5.0, 6.0, 7.0)] + [(2, 99.0), (1, None)],
        "k int, v double",
    )
    # [0, 8) in 4 bins of width 2
    full = histogram_state(a.unionByName(b), ["k"], "v", 0.0, 8.0, 4)
    merged = merge_histogram_state(
        histogram_state(a, ["k"], "v", 0.0, 8.0, 4),
        histogram_state(b, ["k"], "v", 0.0, 8.0, 4),
        ["k"], 4,
    )
    key = lambda r: (r.k, r.hist_0, r.hist_1, r.hist_2, r.hist_3)  # noqa: E731
    assert sorted(map(key, full.collect())) == sorted(map(key, merged.collect()))
    rows = {r.k: (r.hist_0, r.hist_1, r.hist_2, r.hist_3) for r in full.collect()}
    assert rows[1] == (2, 2, 2, 2)      # NULL value uncounted
    assert rows[2] == (1, 0, 0, 1)      # -5 clamps to bin 0, 99 to last bin
    q = full.select(
        "k",
        quantile_from_hist(0.5, 0.0, 8.0, 4).alias("p50"),
        quantile_from_hist(1.0, 0.0, 8.0, 4).alias("p100"),
    )
    got = {r.k: (r.p50, r.p100) for r in q.collect()}
    # k=1: n=8, target=4 -> bin 1 cum 2->4: 2 + (4-2)/2*2 = 4.0; p100 = 8.0
    assert got[1] == (4.0, 8.0)
    # empty histogram -> NULL
    empty = spark.createDataFrame([(9, 0, 0, 0, 0)],
                                  "k int, hist_0 long, hist_1 long, hist_2 long, hist_3 long")
    r = empty.select(quantile_from_hist(0.5, 0.0, 8.0, 4).alias("p")).collect()[0]
    assert r.p is None
    with _pytest.raises(ValueError):
        quantile_from_hist(1.5, 0.0, 8.0, 4)
    with _pytest.raises(ValueError):
        histogram_state(a, ["k"], "v", 0.0, 8.0, 0)


def test_forget_entities_propagates_and_is_idempotent(spark, tmp_path):
    from databricks_demo_feature_store_spark.featurestore import forget_entities
    from databricks_demo_feature_store_spark.featurestore.manager import (
        FeatureStoreManager,
        FeatureTableSpec,
    )
    from pyspark.sql import functions as F

    mgr = FeatureStoreManager(spark, str(tmp_path / "store"))
    a = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 30.0)], "uid int, v double")
    b = spark.createDataFrame([(2, "x"), (4, "y")], "uid int, s string")
    other = spark.createDataFrame([(9, 1.0)], "item int, w double")
    mgr.save(a, FeatureTableSpec(name="ta", primary_keys=("uid",)), mode="overwrite")
    mgr.save(b, FeatureTableSpec(name="tb", primary_keys=("uid",)), mode="overwrite")
    mgr.save(other, FeatureTableSpec(name="tc", primary_keys=("item",)), mode="overwrite")

    forget = spark.createDataFrame([(2,), (3,)], "uid int")
    audit = {r["table"]: r for r in forget_entities(mgr, forget, "uid").collect()}
    assert audit["ta"]["rows_deleted"] == 2 and audit["ta"]["rows_after"] == 1
    assert audit["tb"]["rows_deleted"] == 1 and audit["tb"]["rows_after"] == 1
    # table without the key: accounted for, untouched
    assert audit["tc"]["key_matched"] is False and audit["tc"]["rows_deleted"] == 0
    assert sorted(r.uid for r in mgr.read("ta").collect()) == [1]
    assert sorted(r.uid for r in mgr.read("tb").collect()) == [4]
    assert mgr.read("tc").count() == 1
    # registry metadata survives the swap
    assert mgr.get_metadata("ta")["primary_keys"] == ["uid"]
    # idempotent: a second forget deletes nothing
    audit2 = {r["table"]: r for r in forget_entities(mgr, forget, "uid").collect()}
    assert audit2["ta"]["rows_deleted"] == 0
    assert audit2["tb"]["rows_deleted"] == 0


def test_refresh_join_view_equals_recompute(spark):
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        refresh_join_view,
    )
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 1.0), (4, 30, 2.0)],
        "fid int, k int, v double",
    )
    dim = spark.createDataFrame([(10, "a"), (20, "b"), (30, "c")], "k2 int, attr string")
    view = fact.join(dim, fact["k"] == dim["k2"])

    # fact delete + fact upsert (fid 2 changes value, fid 5 arrives)
    f_delta = spark.createDataFrame([(2, 20, 9.0), (5, 30, 4.0)], "fid int, k int, v double")
    view = refresh_join_view(view, f_delta, dim, on=("k", "k2"), replace_key="fid",
                             deletes=spark.createDataFrame([(3,)], "fid int"))
    # dim update: k=30 renamed
    d_delta = spark.createDataFrame([(30, "C!")], "k2 int, attr string")
    f_now = spark.createDataFrame(
        [(1, 10, 5.0), (2, 20, 9.0), (4, 30, 2.0), (5, 30, 4.0)],
        "fid int, k int, v double",
    )
    view = refresh_join_view(view, d_delta, f_now, on=("k2", "k"), replace_key="k2")

    recomputed = f_now.join(
        spark.createDataFrame([(10, "a"), (20, "b"), (30, "C!")], "k2 int, attr string"),
        F.col("k") == F.col("k2"),
    )
    got = sorted(tuple(r) for r in view.select("fid", "k", "v", "attr").collect())
    want = sorted(tuple(r) for r in recomputed.select("fid", "k", "v", "attr").collect())
    assert got == want
    # no-delta call is the identity
    assert refresh_join_view(view, None, dim, on=("k", "k2"), replace_key="fid") is view


def test_forget_metadata_promoted_atomically(spark, tmp_path, monkeypatch):
    """ADVICE r11: registry metadata must ride in the staging directory so
    the _swap_dirs rename promotes data + primary_keys atomically. A crash
    AT the swap must leave the live table (and its metadata) untouched,
    and the staging dir must already contain the metadata file."""
    import os

    from databricks_demo_feature_store_spark.featurestore import forget_entities
    from databricks_demo_feature_store_spark.featurestore.manager import (
        METADATA_FILE,
        FeatureStoreManager,
        FeatureTableSpec,
    )
    from databricks_demo_feature_store_spark.sources import writers

    mgr = FeatureStoreManager(spark, str(tmp_path / "store"))
    a = spark.createDataFrame([(1, 10.0), (2, 20.0)], "uid int, v double")
    mgr.save(a, FeatureTableSpec(name="ta", primary_keys=("uid",)), mode="overwrite")
    forget = spark.createDataFrame([(2,)], "uid int")

    real_swap = writers._swap_dirs
    staged: dict = {}

    def crash_swap(live, staging, expected_generation=None):
        staged["path"] = staging.removeprefix("file:")
        raise RuntimeError("simulated crash at swap")

    monkeypatch.setattr(writers, "_swap_dirs", crash_swap)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        forget_entities(mgr, forget, "uid")
    # staging already carries the registry metadata — the rename alone
    # would have promoted both
    assert os.path.exists(os.path.join(staged["path"], METADATA_FILE))
    # live table + metadata untouched by the crash
    assert mgr.read("ta").count() == 2
    assert mgr.get_metadata("ta")["primary_keys"] == ["uid"]

    # recovery: the next forget (with the real swap) completes and keeps
    # propagating — primary_keys never got lost
    monkeypatch.setattr(writers, "_swap_dirs", real_swap)
    audit = {r["table"]: r for r in forget_entities(mgr, forget, "uid").collect()}
    assert audit["ta"]["key_matched"] is True and audit["ta"]["rows_deleted"] == 1
    assert mgr.get_metadata("ta")["primary_keys"] == ["uid"]


def test_list_tables_debris_vs_legit_suffix_names(spark, manager, tmp_path):
    """ADVICE r12: list_tables must hide writer crash debris precisely —
    a registered table whose NAME merely ends in __old stays listed, while
    `<existing sibling>__staging` (any random tail) and unregistered
    suffix dirs are excluded."""
    import dataclasses
    import os

    manager.save(_df(spark, [(1, dt.date(2024, 1, 1), 1.0)]), SPEC, mode="overwrite")
    # a LEGITIMATE table whose name ends with a writer suffix, with no
    # 'prices' sibling: must stay visible
    legit = dataclasses.replace(SPEC, name="prices__old")
    manager.save(_df(spark, [(2, dt.date(2024, 1, 1), 2.0)]), legit, mode="overwrite")
    # crash debris: sibling-derived names, including a random staging tail
    # and a stacked _swap_dirs chain — all must be hidden
    for debris in (
        "cust_features__old",
        "cust_features__staging-ab12cd",
        "cust_features__staging__old",
    ):
        os.makedirs(os.path.join(manager.root, debris), exist_ok=True)
    # an unregistered suffix dir with no sibling base (no metadata file):
    # never a table either
    os.makedirs(os.path.join(manager.root, "ghost__compact"), exist_ok=True)
    assert manager.list_tables() == ["cust_features", "prices__old"]


def test_refresh_join_view_from_cdf(spark, tmp_path):
    """CDF-driven IVM: deltas derived from the change feed, default
    version resolution = last commit, maintained ≡ recomputed."""
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        cdf_deltas,
        refresh_join_view_from_cdf,
    )
    from databricks_demo_feature_store_spark.sources.versioned import VersionedTable

    fact0 = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 1.0)], "fk int, dk int, x double"
    )
    # commit: delete fk=3, update fk=2, insert fk=4
    fact1 = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 70.0), (4, 20, 9.0)], "fk int, dk int, x double"
    )
    dim = spark.createDataFrame([(10, "a"), (20, "b")], "dk2 int, attr string")

    vt = VersionedTable(spark, str(tmp_path / "fact_v"))
    with pytest.raises(ValueError, match="no commits"):
        refresh_join_view_from_cdf(fact0, vt, "fk", dim, on=("dk", "dk2"))
    vt.save(fact0)
    with pytest.raises(ValueError, match="no version before"):
        refresh_join_view_from_cdf(fact0, vt, "fk", dim, on=("dk", "dk2"))
    vt.save(fact1)

    delta, dels = cdf_deltas(vt.changes_between(0, 1, ["fk"]), "fk")
    assert {r.fk for r in delta.collect()} == {2, 4}
    assert "_change_type" not in delta.columns
    assert [r.fk for r in dels.collect()] == [3]

    view0 = vt.read(0).join(dim, F.col("dk") == F.col("dk2"))
    got = refresh_join_view_from_cdf(view0, vt, "fk", dim, on=("dk", "dk2"))
    want = fact1.join(dim, F.col("dk") == F.col("dk2"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_refresh_aggregate_state_from_cdf(spark, tmp_path):
    """Aggregate IVM over a change feed: pre-image negation is exact,
    vanished keys drop, maintained state ≡ full recompute bit-for-bit."""
    from databricks_demo_feature_store_spark.featurestore.incremental import (
        aggregate_state,
        refresh_aggregate_state_from_cdf,
    )
    from databricks_demo_feature_store_spark.sources.versioned import VersionedTable

    f0 = spark.createDataFrame(
        [(1, "a", 1.25), (2, "a", 2.50), (3, "b", 4.00), (4, "c", 8.00)],
        "rid int, k string, v double",
    )
    # commit: update rid=2 (a: 2.50 -> 5.00), delete rid=3 (b vanishes
    # entirely), insert rid=5 into c
    f1 = spark.createDataFrame(
        [(1, "a", 1.25), (2, "a", 5.00), (4, "c", 8.00), (5, "c", 0.75)],
        "rid int, k string, v double",
    )
    vt = VersionedTable(spark, str(tmp_path / "f"))
    vt.save(f0)
    vt.save(f1)
    state0 = aggregate_state(f0, ["k"], "v")
    got = refresh_aggregate_state_from_cdf(
        state0, vt, id_keys=["rid"], agg_keys=["k"], value_col="v"
    )
    want = aggregate_state(f1, ["k"], "v")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert {r.k for r in got.collect()} == {"a", "c"}  # b dropped


def test_spec_check_constraints_enforced_every_save(spark, manager):
    """FeatureTableSpec.check_constraints: validated on overwrite AND
    merge before any byte lands; recorded in the registry metadata."""
    import dataclasses

    from databricks_demo_feature_store_spark.sources.writers import (
        CheckConstraintViolation,
    )

    spec = dataclasses.replace(
        SPEC, name="checked_features", check_constraints=("f1 >= 0",)
    )
    manager.save(_df(spark, [(1, dt.date(2024, 1, 1), 1.0)]), spec, mode="overwrite")
    assert manager.get_metadata("checked_features")["check_constraints"] == ["f1 >= 0"]

    # merge path: a violating batch rejects, table unchanged
    with pytest.raises(CheckConstraintViolation):
        manager.save(
            _df(spark, [(2, dt.date(2024, 1, 1), -5.0)]), spec, mode="merge"
        )
    got = manager.read("checked_features").collect()
    assert len(got) == 1 and got[0].f1 == 1.0

    # passing merge lands
    manager.save(_df(spark, [(2, dt.date(2024, 1, 1), 2.0)]), spec, mode="merge")
    assert manager.read("checked_features").count() == 2


def test_save_many_matches_sequential_saves(spark, tmp_path):
    """save_many (overlapped independent writes) must produce tables and
    registry metadata identical to the sequential loop, and refuse
    duplicate targets (two writers on one table would race)."""
    import datetime as dt

    from databricks_demo_feature_store_spark.featurestore.manager import (
        FeatureStoreManager,
        FeatureTableSpec,
    )

    def spec(name):
        return FeatureTableSpec(
            name=name,
            primary_keys=("pk_customer", "tpk_release_dt"),
            timestamp_keys=("tpk_release_dt",),
            description=f"tbl {name}",
            source_tables=("orders",),
        )

    frames = {
        f"t{i}": _df(
            spark,
            [(j, dt.date(2024, 1, 1 + j), float(i * 10 + j)) for j in range(3)],
        )
        for i in range(3)
    }
    seq = FeatureStoreManager(spark, str(tmp_path / "seq"))
    for name, df in frames.items():
        seq.save(df, spec(name), mode="overwrite")
    par = FeatureStoreManager(spark, str(tmp_path / "par"))
    diffs = par.save_many(
        [(df, spec(name)) for name, df in frames.items()], mode="overwrite"
    )
    assert set(diffs) == set(frames)
    assert par.list_tables() == seq.list_tables()
    for name in frames:
        a = sorted(map(tuple, seq.read(name).collect()))
        b = sorted(map(tuple, par.read(name).collect()))
        assert a == b
        assert par.get_metadata(name) == seq.get_metadata(name)

    with pytest.raises(ValueError, match="distinct"):
        par.save_many(
            [(frames["t0"], spec("dup")), (frames["t1"], spec("dup"))],
            mode="overwrite",
        )
