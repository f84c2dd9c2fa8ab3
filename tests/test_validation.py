"""Unit tests for the validation subsystem (schemas, monitor, logs)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from databricks_demo_feature_store_spark.validation import (
    ValidationLog,
    cross_check,
    dimension_drift,
    missing_columns,
    outdateness,
    schemas_validation,
)


def test_schemas_validation_quarter_dates(spark):
    df = spark.createDataFrame(
        [("2024-01-q1", "10"), ("2024-01-q2", "20"), ("2024-03-q1", "30")],
        ["d", "v"],
    )
    out = schemas_validation(
        df,
        [
            {"source": "d", "name": "half_month", "data_type": "date",
             "format_source": "yyyy-MM-qq"},
            {"source": "v", "name": "value", "data_type": "int"},
        ],
    )
    rows = {r["half_month"]: r["value"] for r in out.collect()}
    assert rows == {
        dt.date(2024, 1, 1): 10,
        dt.date(2024, 1, 16): 20,
        dt.date(2024, 3, 1): 30,
    }
    assert out.columns == ["half_month", "value"]


def test_schemas_validation_year_format_and_missing(spark):
    df = spark.createDataFrame([(2021,)], ["y"])
    out = schemas_validation(
        df, [{"source": "y", "name": "yr", "data_type": "date", "format_source": "yyyy"}]
    )
    assert out.collect()[0]["yr"] == dt.date(2021, 12, 1)
    with pytest.raises(ValueError, match="missing"):
        schemas_validation(df, [{"source": "nope", "name": "x", "data_type": "int"}])
    assert missing_columns(df, ["y", "z"]) == ["z"]


def test_cross_check_thresholds(spark):
    src = spark.createDataFrame(
        [(dt.date(2024, 1, 5),)] * 100 + [(dt.date(2024, 2, 5),)] * 10,
        ["d"],
    )
    tgt = spark.createDataFrame(
        [(dt.date(2024, 1, 7),)] * 98 + [(dt.date(2024, 3, 2),)] * 5,
        ["d"],
    )
    out = {r["month"]: r for r in cross_check(src, tgt, "d", "d", 5.0).collect()}
    jan = out[dt.date(2024, 1, 1)]
    assert (jan["source_count"], jan["target_count"], jan["difference"]) == (100, 98, 2)
    assert jan["percentage"] == 2.0 and jan["passed"]
    feb = out[dt.date(2024, 2, 1)]
    assert feb["target_count"] == 0 and feb["percentage"] == 100.0 and not feb["passed"]
    mar = out[dt.date(2024, 3, 1)]
    assert mar["source_count"] == 0 and mar["percentage"] == 100.0 and not mar["passed"]


def test_dimension_drift(spark):
    cur = spark.range(100)
    prev = spark.range(97)
    row = dimension_drift(cur, prev, threshold_pct=5.0).collect()[0]
    assert row["drift_pct"] == pytest.approx(3.0928, abs=1e-4)
    assert row["passed"]
    row2 = dimension_drift(spark.range(200), prev, threshold_pct=5.0).collect()[0]
    assert not row2["passed"]


def test_outdateness(spark):
    df = spark.createDataFrame([(dt.date(2024, 3, 17),)], ["d"])
    res = outdateness(df, "d", months_shift=1, reference_month=dt.date(2024, 4, 1))
    assert res.passed and res.available_month == dt.date(2024, 4, 1)
    res_stale = outdateness(df, "d", months_shift=1, reference_month=dt.date(2024, 6, 1))
    assert not res_stale.passed
    # December rollover
    dec = spark.createDataFrame([(dt.date(2023, 12, 31),)], ["d"])
    res_dec = outdateness(dec, "d", months_shift=1, reference_month=dt.date(2024, 1, 1))
    assert res_dec.passed and res_dec.available_month == dt.date(2024, 1, 1)


def test_validation_log_roundtrip(spark, tmp_path):
    log = ValidationLog(
        spark, str(tmp_path / "summary"), str(tmp_path / "detail")
    )
    src = spark.createDataFrame([(dt.date(2024, 1, 5),)] * 10, ["d"])
    tgt = spark.createDataFrame([(dt.date(2024, 1, 5),)] * 10, ["d"])
    detail = cross_check(src, tgt, "d", "d")
    log.record(
        "tbl_a", "CROSS_CHECKING", "ingestion", True,
        detail="ok", detail_rows=detail,
        executed_at=dt.datetime(2024, 1, 2, 3, 4, 5),
    )
    log.record(
        "tbl_a", "CROSS_CHECKING", "ingestion", False,
        executed_at=dt.datetime(2024, 2, 2, 3, 4, 5),
    )
    latest = log.latest("tbl_a").collect()
    assert len(latest) == 1 and latest[0]["passed"] is False
    det = spark.read.parquet(str(tmp_path / "detail")).collect()
    assert len(det) == 1 and det[0]["table_name"] == "tbl_a" and det[0]["passed"]


def test_check_expectations_rules(spark):
    """Every rule type: exact violation counts, fraction thresholds, NULL
    handling (value rules ignore NULLs; not_null counts them), uniqueness
    over non-null values, and two-job planning (scan agg + distinct agg)."""
    from databricks_demo_feature_store_spark.validation.expectations import (
        Expectation,
        check_expectations,
    )

    rows = [
        (1, 10.0, "a", "x1"),
        (2, None, "a", "x2"),
        (3, 50.0, "b", "y3"),
        (3, 5.0, "zz", "x4"),
        (None, 20.0, "a", "x5"),
    ]
    df = spark.createDataFrame(rows, ["k", "v", "cat", "code"])
    out = {
        (r["column"], r["rule"]): r
        for r in check_expectations(
            df,
            [
                Expectation("v", "not_null", max_fraction=0.25),
                Expectation("v", "between", lo=0, hi=40),
                Expectation("cat", "in_set", allowed=("a", "b")),
                Expectation("code", "matches", pattern=r"^x"),
                Expectation("k", "unique"),
            ],
        ).collect()
    }
    assert out[("v", "not_null")]["n_violations"] == 1
    assert out[("v", "not_null")]["passed"]            # 0.2 <= 0.25
    assert out[("v", "between")]["n_violations"] == 1  # 50.0; NULL ignored
    assert not out[("v", "between")]["passed"]
    assert out[("cat", "in_set")]["n_violations"] == 1
    assert out[("code", "matches")]["n_violations"] == 1  # y3
    assert out[("k", "unique")]["n_violations"] == 1   # duplicate 3; NULL ignored
    assert all(r["n_rows"] == 5 for r in out.values())

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown expectation rule"):
        check_expectations(df, [Expectation("v", "nope")]).collect()


def test_psi_drift_known_value(spark):
    """PSI matches the hand-computed Laplace-smoothed sum; identical
    distributions give PSI ~ 0."""
    import math

    from databricks_demo_feature_store_spark.validation.drift import psi_drift

    cur = spark.createDataFrame([("a",)] * 6 + [("b",)] * 2, ["c"])
    ref = spark.createDataFrame([("a",)] * 4 + [("b",)] * 4, ["c"])
    row = psi_drift(cur, ref, "c").collect()[0]
    k = 2
    pc = [(6 + 0.5) / (8 + 0.5 * k), (2 + 0.5) / (8 + 0.5 * k)]
    pr = [(4 + 0.5) / (8 + 0.5 * k), (4 + 0.5) / (8 + 0.5 * k)]
    want = sum((a - b) * math.log(a / b) for a, b in zip(pc, pr))
    assert row["column"] == "c" and row["n_categories"] == 2
    assert abs(row["psi"] - want) < 1e-6
    same = psi_drift(ref, ref, "c").collect()[0]
    assert same["psi"] == 0.0


def test_psi_drift_one_sided_category_stays_finite(spark):
    from databricks_demo_feature_store_spark.validation.drift import psi_drift

    cur = spark.createDataFrame([("a",), ("z",)], ["c"])
    ref = spark.createDataFrame([("a",), ("a",)], ["c"])
    row = psi_drift(cur, ref, "c").collect()[0]
    assert row["n_categories"] == 2
    assert row["psi"] == row["psi"] and abs(row["psi"]) < 100  # finite


def test_ks_drift_exact_statistic(spark):
    """KS equals the hand-computed max CDF gap; identical samples → 0."""
    from databricks_demo_feature_store_spark.validation.drift import ks_drift

    cur = spark.createDataFrame([(float(v),) for v in (1, 2, 3)], ["x"])
    ref = spark.createDataFrame([(float(v),) for v in (2, 3, 4, 4)], ["x"])
    row = ks_drift(cur, ref, "x").collect()[0]
    # CDFs at pooled values: 1:(1/3,0) 2:(2/3,1/4) 3:(1,1/2) 4:(1,1)
    want = max(abs(1 / 3 - 0), abs(2 / 3 - 1 / 4), abs(1 - 1 / 2), 0.0)
    assert abs(row["ks_stat"] - round(want, 6)) < 1e-9
    assert row["n_cur"] == 3 and row["n_ref"] == 4
    assert ks_drift(ref, ref, "x").collect()[0]["ks_stat"] == 0.0


def test_attach_global_cumsum_matches_window(spark):
    """Distributed prefix sums equal the single-window cumsum, and the
    plan has no unpartitioned window."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from databricks_demo_feature_store_spark.functions.feature_generation import (
        attach_global_cumsum,
    )

    random.seed(3)
    rows = [(i, random.randint(0, 9)) for i in range(507)]
    df = spark.createDataFrame(rows, "id int, n int")
    got = {
        r["id"]: r["cum_n"]
        for r in attach_global_cumsum(df, [F.col("id").asc()], ["n"]).collect()
    }
    ref = {
        r["id"]: r["c"]
        for r in df.select(
            "id",
            F.sum("n").over(
                W.orderBy("id").rowsBetween(W.unboundedPreceding, 0)
            ).alias("c"),
        ).collect()
    }
    assert got == ref
    plan = (
        attach_global_cumsum(df, [F.col("id").asc()], ["n"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    from tools.explain_audit import unpartitioned_windows_over_raw

    assert unpartitioned_windows_over_raw(plan) == []


def test_count_anomalies_flags_spike(spark):
    """A 10x day against a flat baseline is flagged; flat days are not;
    the first two periods carry NULL z (no baseline) and never flag."""
    import datetime as dt

    from databricks_demo_feature_store_spark.validation.drift import count_anomalies

    rows = []
    for day in range(1, 11):
        n = 100 if day != 8 else 1000
        # tiny jitter so stddev > 0
        n += day % 3
        rows += [(dt.datetime(2024, 3, day, 12, 0, 0),)] * n
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r["period"].day: r for r in
           count_anomalies(df, "ts", trailing=5, z_threshold=3.0, grain="day").collect()}
    assert out[8]["is_anomaly"] is True
    assert out[1]["zscore"] is None and out[1]["is_anomaly"] is False
    assert all(not out[d]["is_anomaly"] for d in out if d != 8)


def test_mutual_information_known_values(spark):
    """MI = ln 2 for a perfectly dependent balanced pair; ~0 for
    independent columns."""
    import math

    from databricks_demo_feature_store_spark.functions.feature_generation import (
        mutual_information,
    )

    dep = spark.createDataFrame([("x", "p")] * 5 + [("y", "q")] * 5, ["a", "b"])
    r = mutual_information(dep, "a", "b").collect()[0]
    assert abs(r["mutual_info"] - round(math.log(2), 6)) < 1e-9
    ind = spark.createDataFrame(
        [("x", "p")] * 3 + [("x", "q")] * 3 + [("y", "p")] * 3 + [("y", "q")] * 3,
        ["a", "b"],
    )
    assert abs(mutual_information(ind, "a", "b").collect()[0]["mutual_info"]) < 1e-9


def test_psi_by_group_per_window(spark):
    """Per-group PSI: a window matching the reference scores ~0, a
    shifted window scores positive; categories missing on one side stay
    finite."""
    cur = spark.createDataFrame(
        [("w1", "a", 50), ("w1", "b", 50),
         ("w2", "a", 95), ("w2", "b", 5)],
        ["window_start", "category", "n"],
    )
    ref = spark.createDataFrame(
        [("a", 500), ("b", 500)], ["category", "n"]
    )
    from databricks_demo_feature_store_spark.validation.drift import psi_by_group

    out = {r["window_start"]: r for r in psi_by_group(cur, ref).collect()}
    assert abs(out["w1"]["psi"]) < 1e-4
    assert out["w2"]["psi"] > 0.5
    assert out["w1"]["n_categories"] == 2 and out["w1"]["n_cur"] == 100


def test_roc_auc_known_values(spark):
    """Hand-computed AUC incl. tie handling; perfect scorer = 1.0;
    anti-scorer = 0.0; constant scorer = 0.5 exactly."""
    from databricks_demo_feature_store_spark.validation.evaluation import roc_auc

    # scores: pos {0.9, 0.5}, neg {0.5, 0.1} — one tie across classes.
    # ranks: 0.1->1, 0.5 avg rank 2.5 (x2), 0.9->4
    # R_pos = 4 + 2.5 = 6.5; AUC = (6.5 - 3) / (2*2) = 0.875
    df = spark.createDataFrame(
        [(0.9, 1), (0.5, 1), (0.5, 0), (0.1, 0)], ["s", "y"]
    )
    r = roc_auc(df, "s", "y").collect()[0]
    assert abs(r["auc"] - 0.875) < 1e-9
    assert r["n_pos"] == 2 and r["n_neg"] == 2

    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], ["s", "y"]
    )
    assert roc_auc(perfect, "s", "y").collect()[0]["auc"] == 1.0
    anti = spark.createDataFrame(
        [(0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)], ["s", "y"]
    )
    assert roc_auc(anti, "s", "y").collect()[0]["auc"] == 0.0
    const = spark.createDataFrame([(0.5, 1), (0.5, 0), (0.5, 0)], ["s", "y"])
    assert roc_auc(const, "s", "y").collect()[0]["auc"] == 0.5


def test_calibration_bins_rates(spark):
    from databricks_demo_feature_store_spark.validation.evaluation import (
        calibration_bins,
    )

    rows = [(0.05, 0)] * 9 + [(0.05, 1)] + [(0.95, 1)] * 8 + [(0.95, 0)] * 2
    df = spark.createDataFrame(rows, ["s", "y"])
    out = {r["bin"]: r for r in calibration_bins(df, "s", "y", 10).collect()}
    assert set(out) == {1, 10}
    assert out[1]["n"] == 10 and abs(out[1]["positive_rate"] - 0.1) < 1e-9
    assert abs(out[1]["mean_score"] - 0.05) < 1e-9
    assert out[10]["n"] == 10 and abs(out[10]["positive_rate"] - 0.8) < 1e-9
    # clamp: out-of-range scores land in edge bins
    edge = spark.createDataFrame([(-0.2, 0), (1.3, 1)], ["s", "y"])
    got = {r["bin"] for r in calibration_bins(edge, "s", "y", 10).collect()}
    assert got == {1, 10}


def test_psi_numeric_detects_shift(spark):
    """A mean-shifted numeric slice scores high PSI; the identical
    distribution scores ~0 (bins fitted on the reference)."""
    from databricks_demo_feature_store_spark.validation.drift import psi_numeric

    ref = spark.createDataFrame([(float(v),) for v in range(100)], ["x"])
    same = psi_numeric(ref, ref, "x", n_bins=4).collect()[0]
    assert abs(same["psi"]) < 1e-4 and same["n_categories"] == 4
    shifted = spark.createDataFrame([(float(v + 80),) for v in range(100)], ["x"])
    assert psi_numeric(shifted, ref, "x", n_bins=4).collect()[0]["psi"] > 1.0


def test_threshold_metrics_counts(spark):
    from databricks_demo_feature_store_spark.validation.evaluation import (
        threshold_metrics,
    )

    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 0), (0.4, 1), (0.1, 0)], ["s", "y"]
    )
    out = {r["threshold"]: r for r in
           threshold_metrics(df, "s", "y", [0.5]).collect()}
    r = out[0.5]
    assert (r["tp"], r["fp"], r["fn"]) == (1, 1, 1)
    assert r["precision"] == 0.5 and r["recall"] == 0.5 and r["f1"] == 0.5


def test_decile_lift_orders_buckets(spark):
    """Perfect scorer: top bucket lift = 1/base_rate, cumulative gain
    reaches 1.0 by the bucket holding the last positive."""
    from databricks_demo_feature_store_spark.validation.evaluation import (
        decile_lift,
    )

    rows = [(i, 1.0 - i / 100.0, 1 if i < 20 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "s", "y"])
    out = {r["bucket"]: r for r in decile_lift(df, "s", "y", "id", n_bins=5).collect()}
    assert out[1]["positive_rate"] == 1.0 and out[1]["lift"] == 5.0
    assert out[1]["cumulative_gain"] == 1.0  # all positives in the top quintile
    assert out[5]["positive_rate"] == 0.0


def test_anomalies_from_counts_matches_raw_path(spark):
    """The pre-aggregated scoring stage gives identical output to
    count_anomalies over the raw rows."""
    import datetime as dt

    from databricks_demo_feature_store_spark.validation.drift import (
        anomalies_from_counts,
        count_anomalies,
    )

    rows = []
    for day in range(1, 9):
        n = 50 + day % 4 + (300 if day == 6 else 0)
        rows += [(dt.datetime(2024, 5, day, 9, 0, 0),)] * n
    raw = spark.createDataFrame(rows, "ts timestamp")
    via_raw = sorted(map(tuple, count_anomalies(raw, "ts", trailing=4, grain="day").collect()))
    counts = raw.groupBy(F.col("ts").cast("date").alias("period")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    via_counts = sorted(map(tuple, anomalies_from_counts(counts, trailing=4).collect()))
    assert via_raw == via_counts
    assert any(r[-1] for r in via_counts)  # the day-6 spike flags


def test_count_anomalies_zero_variance_baseline(spark):
    """A flat baseline (stddev 0) must still flag any deviation — the
    quota-fed-source collapse case; an unchanged flat count does not
    flag."""
    import datetime as dt

    from databricks_demo_feature_store_spark.validation.drift import count_anomalies

    rows = []
    for day in range(1, 8):
        n = 100 if day != 7 else 3  # flat, then collapse
        rows += [(dt.datetime(2024, 6, day),)] * n
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r["period"].day: r for r in
           count_anomalies(df, "ts", trailing=5, grain="day").collect()}
    assert out[7]["is_anomaly"] is True and out[7]["zscore"] is None
    assert out[6]["is_anomaly"] is False  # flat and unchanged


def test_pr_curve_and_average_precision(spark):
    """Hand-computed step-wise AP with a tie; perfect scorer AP = 1.0;
    curve rows carry exact cumulative tp/fp per distinct threshold."""
    from databricks_demo_feature_store_spark.validation.evaluation import (
        average_precision,
        pr_curve,
    )

    # descending groups: 0.9 (1 pos), 0.5 (1 pos + 1 neg tie), 0.1 (1 neg)
    # AP = (1/2)*(1/1) + (1/2)*(2/3) + 0 = 0.833333...
    df = spark.createDataFrame(
        [(0.9, 1), (0.5, 1), (0.5, 0), (0.1, 0)], ["s", "y"]
    )
    curve = {r["threshold"]: r for r in pr_curve(df, "s", "y").collect()}
    assert curve[0.9]["tp"] == 1 and curve[0.9]["fp"] == 0
    assert curve[0.9]["precision"] == 1.0 and abs(curve[0.9]["recall"] - 0.5) < 1e-9
    assert curve[0.5]["tp"] == 2 and curve[0.5]["fp"] == 1
    assert abs(curve[0.5]["precision"] - 2 / 3) < 1e-6
    assert curve[0.1]["tp"] == 2 and curve[0.1]["fp"] == 2

    r = average_precision(df, "s", "y").collect()[0]
    assert abs(r["average_precision"] - (0.5 + 0.5 * 2 / 3)) < 1e-6
    assert r["n_pos"] == 2 and r["n_neg"] == 2

    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)], ["s", "y"]
    )
    assert (
        abs(average_precision(perfect, "s", "y").collect()[0]["average_precision"] - 1.0)
        < 1e-6
    )
    # constant scorer: single group, AP = precision = base rate
    const = spark.createDataFrame([(0.5, 1), (0.5, 0), (0.5, 0), (0.5, 0)], ["s", "y"])
    assert (
        abs(average_precision(const, "s", "y").collect()[0]["average_precision"] - 0.25)
        < 1e-6
    )


def test_pit_leakage_audit(spark):
    """Violations = feature ts strictly after label ts - embargo; NULL
    feature ts counted apart; worst lookahead in seconds reported."""
    import datetime as dt

    from databricks_demo_feature_store_spark.validation.leakage import (
        pit_leakage_audit,
    )

    t0 = dt.datetime(2024, 1, 10, 12, 0, 0)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # (label_ts, clean_ts, leaky_ts)
        (t0, ts(-3600), ts(300)),    # leaky peeks 300s ahead
        (t0, ts(-60), ts(-30)),      # clean under zero embargo
        (t0, None, ts(7200)),        # null clean ts; big leak
    ]
    df = spark.createDataFrame(rows, ["label_ts", "f_clean", "f_leaky"])
    out = {r["feature"]: r for r in
           pit_leakage_audit(df, "label_ts", ["f_clean", "f_leaky"]).collect()}
    assert out["f_clean"]["n_violations"] == 0
    assert out["f_clean"]["n_null_ts"] == 1
    assert out["f_clean"]["max_lookahead_sec"] is None
    assert out["f_leaky"]["n_violations"] == 2
    assert out["f_leaky"]["max_lookahead_sec"] == 7200
    assert abs(out["f_leaky"]["violation_share"] - 2 / 3) < 1e-6

    # embargo pulls the cutoff earlier: f_leaky's -30s row now violates
    # too (cutoff = label - 60; boundary is STRICT, so f_clean's -60s
    # row still passes), and every lookahead grows by the embargo
    emb = {r["feature"]: r for r in
           pit_leakage_audit(df, "label_ts", ["f_clean", "f_leaky"],
                             embargo_seconds=60).collect()}
    assert emb["f_clean"]["n_violations"] == 0
    assert emb["f_leaky"]["n_violations"] == 3
    assert emb["f_leaky"]["max_lookahead_sec"] == 7260


def test_feature_auc_screen_matches_roc_auc(spark):
    """Per-feature AUCs from the grouped screen equal the single-feature
    roc_auc on each column, including tie handling and an
    anti-predictive feature (auc < 0.5)."""
    from databricks_demo_feature_store_spark.validation.evaluation import (
        feature_auc_screen,
        roc_auc,
    )

    rows = [
        (0.9, 0.1, 0.5, 1),
        (0.8, 0.2, 0.5, 1),
        (0.4, 0.6, 0.5, 0),
        (0.3, 0.9, 0.5, 0),
        (0.8, 0.4, 0.5, 0),  # tie in f_good; f_flat all-tied
    ]
    df = spark.createDataFrame(rows, ["f_good", "f_anti", "f_flat", "y"])
    out = {r["feature"]: r for r in
           feature_auc_screen(df, ["f_good", "f_anti", "f_flat"], "y").collect()}
    for c in ("f_good", "f_anti", "f_flat"):
        solo = roc_auc(df.select(c, "y"), c, "y").collect()[0]
        assert out[c]["auc"] == solo["auc"], c
        assert out[c]["n_pos"] == solo["n_pos"] == 2
    assert out["f_good"]["auc"] > 0.5
    assert out["f_anti"]["auc"] < 0.5
    assert out["f_flat"]["auc"] == 0.5


def test_cohens_kappa_hand_values(spark):
    """Perfect agreement = 1; hand-computed 2x2 case; constant raters
    with pe = 1 yield NULL kappa."""
    from databricks_demo_feature_store_spark.validation.evaluation import (
        cohens_kappa,
    )

    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("x", "x")], ["a", "b"]
    )
    assert cohens_kappa(perfect, "a", "b").collect()[0]["kappa"] == 1.0

    # po = 0.7; marginals a: 25/25, b: 30/20 -> pe = (25*30 + 25*20)/2500 = 0.5
    rows = (
        [("p", "p")] * 20 + [("p", "n")] * 5 + [("n", "p")] * 10
        + [("n", "n")] * 15
    )
    r = cohens_kappa(spark.createDataFrame(rows, ["a", "b"]), "a", "b").collect()[0]
    assert abs(r["p_observed"] - 0.7) < 1e-9
    assert abs(r["p_expected"] - 0.5) < 1e-9
    assert abs(r["kappa"] - 0.4) < 1e-6
    assert r["n"] == 50

    const = spark.createDataFrame([("x", "x"), ("x", "x")], ["a", "b"])
    assert cohens_kappa(const, "a", "b").collect()[0]["kappa"] is None


def test_cusum_changepoints_matches_recursion(spark):
    """CUSUM via the running-min identity equals the direct
    max(0, S+x) recursion; a sustained level shift alarms where the
    per-period z-test would stay quiet."""
    import datetime as dt
    import math

    from databricks_demo_feature_store_spark.validation.drift import (
        cusum_changepoints,
    )

    # 10 quiet days at ~100 rows, then 10 days at ~115 (a +15% plateau)
    day_counts = [100, 101, 99, 100, 102, 98, 100, 101, 99, 100,
                  115, 114, 116, 115, 113, 115, 116, 114, 115, 115]
    rows = []
    for i, c in enumerate(day_counts):
        d = dt.datetime(2024, 3, 1) + dt.timedelta(days=i)
        rows += [(d,)] * c
    df = spark.createDataFrame(rows, ["ts"])
    out = {r["period"].isoformat(): r
           for r in cusum_changepoints(df, "ts", slack=0.5, threshold=3.0).collect()}

    k = len(day_counts)
    mean = sum(day_counts) / k
    var = (sum(c * c for c in day_counts) - sum(day_counts) * mean) / (k - 1)
    sd = math.sqrt(var)
    sp = sn = 0.0
    expect_alarm = {}
    for i, c in enumerate(day_counts):
        z = (c - mean) / sd
        sp = max(0.0, sp + round(z - 0.5, 9))
        sn = max(0.0, sn + round(-z - 0.5, 9))
        d = (dt.date(2024, 3, 1) + dt.timedelta(days=i)).isoformat()
        expect_alarm[d] = sp > 3.0 or sn > 3.0
        assert abs(out[d]["cusum_pos"] - sp) < 1e-6, d
        assert abs(out[d]["cusum_neg"] - sn) < 1e-6, d
    assert {d for d, r in out.items() if r["is_changepoint"]} == {
        d for d, a in expect_alarm.items() if a
    }
    assert any(expect_alarm.values())          # the shift IS detected
    assert max(abs(r["zscore"]) for r in out.values()) < 3.0  # z-test quiet


def test_average_precision_no_positives_is_null(spark):
    """n_pos = 0 must yield NULL AP (undefined), not 0.0 — mirroring
    roc_auc's convention for the degenerate case."""
    from databricks_demo_feature_store_spark.validation.evaluation import (
        average_precision,
    )

    df = spark.createDataFrame(
        [(0.9, 0), (0.4, 0), (0.1, 0)], ["score", "label"]
    )
    row = average_precision(df, "score", "label").collect()[0]
    assert row["average_precision"] is None
    assert (row["n_pos"], row["n_neg"]) == (0, 3)


def test_feature_screen_and_leakage_quoted_column_names(spark):
    """Column names containing quotes/backticks must survive the stack()
    interpolation (escaped, not parse-error or mislabeled)."""
    from databricks_demo_feature_store_spark.validation.evaluation import (
        feature_auc_screen,
    )
    from databricks_demo_feature_store_spark.validation.leakage import (
        pit_leakage_audit,
    )

    weird = "it's `weird`"
    df = spark.createDataFrame(
        [(1.0, 1), (0.0, 0), (0.5, 1), (0.2, 0)], ["x", "label"]
    ).withColumnRenamed("x", weird)
    out = {r["feature"]: r["auc"] for r in
           feature_auc_screen(df, [weird], "label").collect()}
    assert set(out) == {weird} and out[weird] == 1.0

    ts = spark.createDataFrame(
        [("2024-01-02 00:00:00", "2024-01-01 00:00:00"),
         ("2024-01-02 00:00:00", "2024-01-03 00:00:00")],
        ["label_ts", "x"],
    ).withColumnRenamed("x", weird)
    audit = {r["feature"]: r["n_violations"] for r in
             pit_leakage_audit(ts, "label_ts", [weird]).collect()}
    assert audit == {weird: 1}


def test_privacy_audit_and_risk_groups(spark):
    """Hand-built groups: k/l thresholds, rows_at_risk, and the violating
    group listing."""
    from databricks_demo_feature_store_spark.validation.integrity import (
        privacy_audit,
        privacy_risk_groups,
    )

    rows = (
        [("30s", "NY", f"d{i}") for i in range(5)]       # size 5, 5 distinct
        + [("40s", "SF", "flu"), ("40s", "SF", "flu")]   # size 2, 1 distinct
        + [("50s", "LA", "ok")]                           # size 1, 1 distinct
    )
    df = spark.createDataFrame(rows, ["age", "city", "diagnosis"])
    s = privacy_audit(df, ["age", "city"], "diagnosis", k=3, l=2).collect()[0]
    assert (s["n_rows"], s["n_groups"], s["min_group_size"]) == (8, 3, 1)
    assert (s["n_k_violating_groups"], s["rows_at_risk"]) == (2, 3)
    assert s["risk_share"] == round(3 / 8, 6)
    assert (s["min_l_diversity"], s["n_l_violating_groups"]) == (1, 2)

    g = {(r["age"], r["city"]): (r["group_size"], r["n_sensitive"],
                                 r["k_violation"], r["l_violation"])
         for r in privacy_risk_groups(df, ["age", "city"], "diagnosis",
                                      k=3, l=2).collect()}
    assert g == {("40s", "SF"): (2, 1, True, True),
                 ("50s", "LA"): (1, 1, True, True)}


def test_benford_deviation_digits_and_shares(spark):
    """Leading digits from the string form; zero/negative/null excluded;
    shares sum the observed counts."""
    from databricks_demo_feature_store_spark.validation.integrity import (
        benford_deviation,
    )
    import math

    df = spark.createDataFrame(
        [(1.0,), (12.5,), (190.0,), (25.0,), (0.034,), (0.0,), (-7.0,), (None,)],
        ["v"],
    )
    out = {r["digit"]: r for r in benford_deviation(df, "v").collect()}
    # 1.0, 12.5, 190.0 -> 1; 25.0 -> 2; 0.034 -> 3
    assert {d: out[d]["n"] for d in out} == {1: 3, 2: 1, 3: 1}
    assert out[1]["observed_share"] == round(3 / 5, 6)
    assert out[1]["expected_share"] == round(math.log10(2.0), 6)
    assert out[2]["abs_deviation"] == round(
        abs(round(1 / 5, 6) - round(math.log10(1.5), 6)), 6
    )


def test_serving_skew_audit(spark):
    """Identical snapshot/history distributions → PSI exactly 0 (each
    entity has one row, so online == offline); a shifted history (old
    rows much smaller than the latest) → positive PSI; NULLs form their
    own category on both sides."""
    import datetime as dt

    from databricks_demo_feature_store_spark.validation import serving_skew_audit

    def t(s):
        return dt.datetime.fromisoformat(s)

    # case 1: single row per entity — online IS offline
    one = spark.createDataFrame(
        [(i, t("2024-01-01"), float(i)) for i in range(1, 9)],
        "ck long, rd timestamp, fx double",
    )
    r1 = {r["feature"]: r for r in serving_skew_audit(
        one, ("ck", "rd"), "rd", ("fx",), n_bins=4).collect()}
    assert r1["fx"]["psi"] == 0.0
    assert r1["fx"]["n_online"] == 8 and r1["fx"]["n_offline"] == 8

    # case 2: history has small values, snapshots are the large tail →
    # the snapshot mass concentrates in the top bins, PSI > 0; one
    # entity's latest fx is NULL → '__null__' category appears
    rows = []
    for i in range(1, 9):
        rows.append((i, t("2024-01-01"), float(i)))          # old: 1..8
        rows.append((i, t("2024-02-01"), float(i) + 100.0))  # latest: 101..108
    rows.append((9, t("2024-02-01"), None))                  # latest NULL
    hist = spark.createDataFrame(rows, "ck long, rd timestamp, fx double")
    r2 = {r["feature"]: r for r in serving_skew_audit(
        hist, ("ck", "rd"), "rd", ("fx",), n_bins=4).collect()}
    fx = r2["fx"]
    assert fx["n_online"] == 9 and fx["n_offline"] == 17
    assert fx["psi"] > 0.5  # gross shift must score loudly
    assert fx["n_categories"] == 5  # 4 bins + __null__
