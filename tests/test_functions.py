"""Unit tests for scalar function families."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from databricks_demo_feature_store_spark.functions import (
    binarize,
    calculate_percentages,
    calculate_ratios,
    categorize_by_fixed_values,
    choose_columns_as_value,
    concat_columns,
    decimals_to_floats,
    drop_duplicates,
    drop_na,
    impute_dataframe,
    longs_to_integers,
    math_operations,
    months_between_dates,
    normalize_string_values,
    rename_columns,
    shift_date,
    standardize_na_values,
    trim_string_columns,
    yearmonth_from_columns,
)
from databricks_demo_feature_store_spark.functions.feature_generation import spark_function_operations
from databricks_demo_feature_store_spark.functions.strings import standardize_column_names
from databricks_demo_feature_store_spark.functions.types import apply_schema


def one(df, col):
    return df.select(col).first()[0]


def test_shift_date_availability_shift(spark):
    df = spark.createDataFrame([("2024-03",)], "periodo string")
    out = shift_date(df, "periodo", "release_dt", source_format="yyyy-MM", months_to_add=1)
    assert one(out, "release_dt") == dt.date(2024, 4, 1)


def test_shift_date_days_no_truncate(spark):
    df = spark.createDataFrame([("2024-03-15",)], "d string")
    out = shift_date(df, "d", "shifted", source_format="yyyy-MM-dd", days_to_add=3)
    assert one(out, "shifted") == dt.date(2024, 3, 18)


def test_yearmonth_from_columns(spark):
    df = spark.createDataFrame([(2024, 3)], "y int, m int")
    out = yearmonth_from_columns(df, "y", "m", "d")
    assert one(out, "d") == dt.date(2024, 3, 1)


def test_months_between_truncates(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 15), dt.date(2024, 4, 1))], "a date, b date"
    )
    out = months_between_dates(df, "a", "b", "mm")
    assert one(out, "mm") == 2  # 2.548... truncated by int cast


def test_normalize_strings(spark):
    df = spark.createDataFrame([("  Tarjeta de Crédito!! ",)], "s string")
    out = normalize_string_values(df, ["s"])
    assert one(out, "s") == "tarjeta_de_credito"


def test_trim_only_strings(spark):
    df = spark.createDataFrame([(" a ", 1)], "s string, i int")
    out = trim_string_columns(df)
    assert one(out, "s") == "a"


def test_standardize_column_names(spark):
    df = spark.createDataFrame([(1, 2)], "`Fecha Apertura` int, `Año-Censo` int")
    out = standardize_column_names(df)
    assert out.columns == ["fecha_apertura", "ano_censo"]


def test_concat_columns_with_literal(spark):
    df = spark.createDataFrame([("x", 7)], "a string, b int")
    out = concat_columns(df, "c", ["lit:pre_", "a", "b"])
    assert one(out, "c") == "pre_x7"


def test_math_operations(spark):
    df = spark.createDataFrame([(10.0, 4.0)], "a double, b double")
    assert one(math_operations(df, "o", "a", "b", "sub"), "o") == 6.0
    with pytest.raises(ValueError):
        math_operations(df, "o", "a", "b", "bitand")


def test_ratios_and_percentages(spark):
    df = spark.createDataFrame([(10.0, 4.0), (10.0, 0.0)], "num double, den double")
    out = calculate_ratios(df, [("num", "den")])
    got = sorted(r[0] for r in out.select("num_to_den_ratio").collect() if r[0] is not None)
    assert got == [2.5]
    pct = calculate_percentages(df, [("den", "num")])
    assert sorted(r[0] for r in pct.select("den_pct").collect()) == [0.0, 40.0]


def test_choose_columns_as_value(spark):
    df = spark.createDataFrame([(1, 5.0, 9.0), (2, 5.0, 9.0)], "k int, a double, b double")
    out = choose_columns_as_value(
        df,
        "c",
        cases=[
            {"condition": "k = 1", "column": "a"},
            {"condition": "k = 2", "value": "NULL"},
        ],
        default=0.0,
    )
    assert [r[0] for r in out.orderBy("k").select("c").collect()] == [5.0, None]


def test_categorize_by_fixed_values(spark):
    df = spark.createDataFrame([("Soltero",), ("Casado",), ("???",)], "estado string")
    out = categorize_by_fixed_values(
        df, "estado", "grp", {"single": ["Soltero"], "married": ["Casado"]}, default="other"
    )
    assert sorted(r[0] for r in out.select("grp").collect()) == ["married", "other", "single"]


def test_binarize(spark):
    df = spark.createDataFrame([(5.0,), (-1.0,)], "v double")
    out = binarize(df, {"pos": "v > 0"})
    assert sorted(r[0] for r in out.select("pos").collect()) == [False, True]


def test_standardize_na_and_drops(spark):
    df = spark.createDataFrame(
        [("999999999", 1.0), ("42", None), ("42", None)], "id string, v double"
    )
    out = standardize_na_values(df, ["id"])
    assert out.filter(F.col("id").isNull()).count() == 1
    assert drop_na(out, subset=["v"]).count() == 1
    assert drop_duplicates(out).count() == 2


def test_impute_and_rename(spark):
    df = spark.createDataFrame([(None, None)], "a double, b string")
    out = impute_dataframe(df, {"a": 0.0, "b": "missing"})
    assert out.first() == (0.0, "missing")
    renamed = rename_columns(df, {"a": "x"})
    assert renamed.columns == ["x", "b"]
    with pytest.raises(ValueError):
        rename_columns(df, {"zzz": "y"})


def test_type_normalization(spark):
    df = spark.createDataFrame([(1,)], "i long").select(
        F.col("i"), F.lit("1.5").cast("decimal(10,2)").alias("d")
    )
    out = longs_to_integers(decimals_to_floats(df))
    types = dict(out.dtypes)
    assert types == {"i": "int", "d": "double"}


def test_apply_schema_quarter_dates(spark):
    df = spark.createDataFrame([("2024-03-q2", "7")], "fecha string, monto string")
    out = apply_schema(
        df,
        [
            {"source": "fecha", "name": "event_dt", "data_type": "date", "format_source": "yyyy-MM-qq"},
            {"source": "monto", "name": "amount", "data_type": "double"},
        ],
    )
    assert out.first() == (dt.date(2024, 3, 16), 7.0)


def test_spark_function_operations_allowlist(spark):
    df = spark.createDataFrame([(-3.0,)], "v double")
    out = spark_function_operations(df, "a", "abs", columns=["v"])
    assert one(out, "a") == 3.0
    with pytest.raises(ValueError):
        spark_function_operations(df, "x", "expr", literals=["1=1"])


def test_target_encode_smoothing_and_loo(spark):
    """Hand-checked shrinkage arithmetic, NULL category → global mean,
    and leave-one-out excluding each row's own target."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        target_encode,
    )

    rows = [("a", 10.0), ("a", 20.0), ("b", 100.0), (None, 40.0)]
    df = spark.createDataFrame(rows, ["cat", "y"])
    gmean = (10 + 20 + 100 + 40) / 4  # 42.5

    plain = {
        (r["cat"], r["y"]): r["cat_target_enc"]
        for r in target_encode(df, "cat", "y", smoothing=2.0).collect()
    }
    assert plain[("a", 10.0)] == round((30 + 2 * gmean) / (2 + 2), 6)
    assert plain[("b", 100.0)] == round((100 + 2 * gmean) / (1 + 2), 6)

    loo = {
        (r["cat"], r["y"]): r["cat_target_enc"]
        for r in target_encode(
            df, "cat", "y", smoothing=2.0, leave_one_out=True
        ).collect()
    }
    # row (a, 10): stats exclude itself → sum 20, cnt 1
    assert loo[("a", 10.0)] == round((20 + 2 * gmean) / (1 + 2), 6)
    # singleton b excluded from itself → cnt 0 → pure prior
    assert loo[("b", 100.0)] == round((0 + 2 * gmean) / (0 + 2), 6)


def test_train_test_split_deterministic_and_proportioned(spark):
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        train_test_split_col,
    )
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(F.col("id"))
    out = df.select("id", train_test_split_col(F.col("id"), 0.2, 0.1).alias("s"))
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["test"] / 10_000 - 0.2) < 0.02
    assert abs(counts["val"] / 10_000 - 0.1) < 0.02
    # stable: re-evaluation yields identical assignment
    again = {r["id"]: r["s"] for r in out.collect()}
    again2 = {r["id"]: r["s"] for r in df.select(
        "id", train_test_split_col(F.col("id"), 0.2, 0.1).alias("s")).collect()}
    assert again == again2


def test_quantile_bin_equal_frequency(spark):
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        quantile_bin,
    )
    from pyspark.sql import functions as F

    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("v"))
    out = quantile_bin(df, "v", 4, tiebreak_cols=["id"])
    counts = {r["v_qbin4"]: r["n"] for r in
              out.groupBy("v_qbin4").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {1, 2, 3, 4} and all(v == 25 for v in counts.values())
    # bins are monotone in value: max of bin k <= min of bin k+1
    rows = out.select("v", "v_qbin4").collect()
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r["v_qbin4"], []).append(r["v"])
    for k in (1, 2, 3):
        assert max(by_bin[k]) <= min(by_bin[k + 1])


def test_quantile_bin_matches_ntile_and_stays_distributed(spark):
    """The distributed rank must reproduce Spark's own global ntile
    exactly, and the physical plan must contain NO unpartitioned Window
    (the single-partition shape the round-5 verdict flagged)."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from databricks_demo_feature_store_spark.functions.feature_generation import (
        quantile_bin,
    )

    random.seed(11)
    rows = [(i, random.randint(0, 40) / 8.0) for i in range(1013)]
    df = spark.createDataFrame(rows, "id int, v double")
    got = {
        (r["id"],): r["v_qbin7"]
        for r in quantile_bin(df, "v", 7, tiebreak_cols=["id"]).collect()
    }
    ref = {
        (r["id"],): r["b"]
        for r in df.select(
            "id",
            F.ntile(7).over(W.orderBy(F.col("v").asc(), F.col("id").asc())).alias("b"),
        ).collect()
    }
    assert got == ref
    plan = (
        quantile_bin(df, "v", 7, tiebreak_cols=["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition" not in plan.lower()
    # the binned data shuffles once: a range exchange, never SinglePartition
    # on the unaggregated side
    assert "rangepartitioning(v#" in plan


def test_feature_correlations_known_values(spark):
    import math

    from databricks_demo_feature_store_spark.functions.feature_generation import (
        feature_correlations,
    )

    rows = [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.5, -4.0)]
    df = spark.createDataFrame(rows, ["x", "y", "z"])
    out = {
        (r["col_a"], r["col_b"]): r["pearson_corr"]
        for r in feature_correlations(df, ["x", "y", "z"]).collect()
    }
    assert out[("x", "z")] == -1.0
    assert 0.99 < out[("x", "y")] < 1.0
    # cross-check one pair against the closed form
    xs = [r[0] for r in rows]; ys = [r[1] for r in rows]
    mx, my = sum(xs)/4, sum(ys)/4
    num = sum((a-mx)*(b-my) for a, b in zip(xs, ys))
    den = math.sqrt(sum((a-mx)**2 for a in xs) * sum((b-my)**2 for b in ys))
    assert out[("x", "y")] == round(num/den, 6)


def test_assign_bins_boundaries(spark):
    """Values equal to a cutpoint fall in the LOWER bin; NULLs bin NULL;
    unordered cutpoint input is sorted before assignment."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        assign_bins,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 10.5), (4, 25.0), (5, None)], ["id", "x"]
    )
    cuts = spark.createDataFrame([(20.0,), (10.0,)], ["cutpoint"])  # unsorted
    out = {r["id"]: r["x_bin"] for r in assign_bins(df, "x", cuts).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 3, 5: None}


def test_chi2_association_known_values(spark):
    """Chi-square matches the textbook 2x2 computation; independent
    columns give chi2 ~ 0 and a perfectly dependent pair gives V = 1."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        chi2_association,
    )

    # 2x2: a=x: (b=p 30, b=q 10); a=y: (b=p 10, b=q 30)
    rows = (
        [("x", "p")] * 30 + [("x", "q")] * 10
        + [("y", "p")] * 10 + [("y", "q")] * 30
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    r = chi2_association(df, "a", "b").collect()[0]
    # e = 20 everywhere; chi2 = 4 * (10^2 / 20) = 20; V = sqrt(20/80) = 0.5
    assert abs(r["chi2"] - 20.0) < 1e-6
    assert abs(r["cramers_v"] - 0.5) < 1e-6
    assert r["dof"] == 1 and r["n"] == 80

    dep = spark.createDataFrame([("x", "p")] * 5 + [("y", "q")] * 5, ["a", "b"])
    rd = chi2_association(dep, "a", "b").collect()[0]
    assert abs(rd["cramers_v"] - 1.0) < 1e-6


def test_winsorize_clips_to_percentiles(spark):
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        winsorize,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 101)] + [(None,)], "v double"
    )
    out = {r["v"]: r["v_wins"] for r in winsorize(df, ["v"], 0.1, 0.9).collect()}
    # exact percentiles of 1..100: p10 = 10.9, p90 = 90.1 (up to fp repr)
    assert abs(out[1.0] - 10.9) < 1e-9 and abs(out[5.0] - 10.9) < 1e-9
    assert abs(out[100.0] - 90.1) < 1e-9 and abs(out[95.0] - 90.1) < 1e-9
    assert out[50.0] == 50.0
    assert out[None] is None


def test_quantile_bin_nulls_get_null_bin(spark):
    """NULL values take a NULL bin (matching assign_bins) and the ntile
    boundaries are computed over non-NULL values only."""
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        quantile_bin,
    )

    rows = [(i, float(i)) for i in range(8)] + [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "id int, v double")
    out = {r["id"]: r["v_qbin4"] for r in
           quantile_bin(df, "v", 4, tiebreak_cols=["id"]).collect()}
    assert out[100] is None and out[101] is None
    # 8 non-null values into 4 bins of 2
    assert [out[i] for i in range(8)] == [1, 1, 2, 2, 3, 3, 4, 4]


def test_robust_outlier_flags(spark):
    """MAD-based z flags the planted outlier; the outlier cannot mask
    itself (unlike mean/std z); zero-MAD groups flag any deviant."""
    from databricks_demo_feature_store_spark.functions.quality import (
        robust_outlier_flags,
    )

    rows = [("a", float(v)) for v in (10, 11, 12, 13, 14)] + [("a", 1000.0)]
    rows += [("b", 5.0)] * 4 + [("b", 6.0)]  # near-constant group
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {(r["g"], r["v"]): r for r in
           robust_outlier_flags(df, "v", ["g"]).collect()}
    assert out[("a", 1000.0)]["v_is_outlier"] is True
    assert out[("a", 12.0)]["v_is_outlier"] is False
    # group b: median 5, MAD 0 → the 6.0 is a flat-break anomaly
    assert out[("b", 6.0)]["v_is_outlier"] is True
    assert out[("b", 5.0)]["v_is_outlier"] is False


def test_backtest_folds_windows(spark):
    """Each fold trains on everything at or before its cutoff and tests
    on the horizon window only; out-of-window rows drop; a row can
    appear in several folds."""
    import datetime as dt

    from databricks_demo_feature_store_spark.functions.feature_generation import (
        backtest_folds,
    )

    def t(s):
        return dt.datetime.fromisoformat(s)

    df = spark.createDataFrame(
        [(1, t("2024-01-15")), (2, t("2024-02-10")), (3, t("2024-03-20")),
         (4, t("2024-09-01"))],
        ["id", "ts"],
    )
    out = backtest_folds(df, "ts", ["2024-02-01", "2024-03-01"], 30)
    got = {(r["fold"], r["split"], r["id"]) for r in out.collect()}
    assert got == {
        (0, "train", 1), (0, "test", 2),          # fold 0: cutoff Feb 1
        (1, "train", 1), (1, "train", 2), (1, "test", 3),  # fold 1: Mar 1
    }  # id 4 is beyond every horizon -> absent everywhere


def test_rfm_segments_exact(spark):
    """Hand-computed RFM on 5 customers x a tiny fact table: recency is
    reversed (most recent = 5 -> here n_bins=2 so 2), frequency and
    monetary are equal-frequency binned with entity-id tiebreaks, and
    rfm_code composes r*100 + f*10 + m."""
    import datetime as dt

    from databricks_demo_feature_store_spark.functions import rfm_segments

    def t(s):
        return dt.datetime.fromisoformat(s)

    rows = [
        # cust 1: 3 orders, latest Jun 30, total 300
        (1, t("2024-06-30"), 100.0), (1, t("2024-01-01"), 100.0),
        (1, t("2024-02-01"), 100.0),
        # cust 2: 1 order, Jan 10, total 50
        (2, t("2024-01-10"), 50.0),
        # cust 3: 2 orders, latest May 1, total 500
        (3, t("2024-05-01"), 400.0), (3, t("2024-02-01"), 100.0),
        # cust 4: 1 order, Jun 1, total 10
        (4, t("2024-06-01"), 10.0),
        # NULL entity must be dropped, not become a segment
        (None, t("2024-06-01"), 999.0),
    ]
    df = spark.createDataFrame(rows, ["cust", "ts", "amt"])
    out = {r["cust"]: r for r in
           rfm_segments(df, "cust", "ts", "amt", "2024-07-01", n_bins=2)
           .collect()}
    assert set(out) == {1, 2, 3, 4}
    # recency_days: 1->1, 2->173, 3->61, 4->30
    assert out[1]["recency_days"] == 1
    assert out[2]["recency_days"] == 173
    assert out[3]["recency_days"] == 61
    assert out[4]["recency_days"] == 30
    # r ntile order (recency asc, cust asc): 1(1), 4(30) | 3(61), 2(173)
    # reversed: bin1 -> r=2, bin2 -> r=1
    assert out[1]["r_score"] == 2 and out[4]["r_score"] == 2
    assert out[3]["r_score"] == 1 and out[2]["r_score"] == 1
    # f ntile (freq asc, cust asc): 2(1), 4(1) | 3(2), 1(3)
    assert out[2]["f_score"] == 1 and out[4]["f_score"] == 1
    assert out[3]["f_score"] == 2 and out[1]["f_score"] == 2
    # m ntile (sum asc, cust asc): 4(10), 2(50) | 1(300), 3(500)
    assert out[4]["m_score"] == 1 and out[2]["m_score"] == 1
    assert out[1]["m_score"] == 2 and out[3]["m_score"] == 2
    assert out[1]["monetary"] == 300.0
    assert out[1]["rfm_code"] == 222
    assert out[2]["rfm_code"] == 111
    assert out[3]["rfm_code"] == 122
    assert out[4]["rfm_code"] == 211


def test_json_extract_and_profile(spark):
    """Typed extraction yields NULL on missing keys, failed casts and
    malformed documents (never a task error); the key profile counts
    presence over ALL rows including malformed ones."""
    from databricks_demo_feature_store_spark.functions.semistructured import (
        json_extract_typed,
        json_key_profile,
    )

    rows = [
        (1, '{"k": 7, "tag": "a"}'),
        (2, '{"k": "not_an_int", "extra": true}'),
        (3, '{"tag": "b"}'),
        (4, "{broken json"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    ex = {r["id"]: (r["k"], r["tag"]) for r in json_extract_typed(
        df, "props", {"k": "int", "tag": "string"}).collect()}
    assert ex[1] == (7, "a")
    assert ex[2] == (None, None)  # cast failure → NULL, no error
    assert ex[3] == (None, "b")
    assert ex[4] == (None, None)  # malformed → NULL
    assert ex[5] == (None, None)

    prof = {r["key"]: (r["n_present"], r["present_share"]) for r in
            json_key_profile(df, "props").collect()}
    assert prof["k"] == (2, 0.4)      # 2 of 5 rows
    assert prof["tag"] == (2, 0.4)
    assert prof["extra"] == (1, 0.2)

    import pytest as _p
    with _p.raises(ValueError, match="allowlist"):
        json_extract_typed(df, "props", {"k": "map<string,string>"})


def test_json_schema_drift_statuses(spark):
    """added / removed / present statuses and exact share deltas."""
    from databricks_demo_feature_store_spark.functions.semistructured import (
        json_schema_drift,
    )

    ref = spark.createDataFrame(
        [('{"a": 1, "legacy": 1}',), ('{"a": 2}',), ('{"a": 3}',), (None,)],
        "props string",
    )
    cur = spark.createDataFrame(
        [('{"a": 1, "fresh": 9}',), ('{"a": 2}',), ('{"fresh": 1}',), ("{bad",)],
        "props string",
    )
    got = {r["key"]: r for r in json_schema_drift(cur, ref, "props").collect()}
    assert got["legacy"]["status"] == "removed" and got["legacy"]["cur_share"] == 0.0
    assert got["fresh"]["status"] == "added" and got["fresh"]["cur_share"] == 0.5
    a = got["a"]
    assert a["status"] == "present"
    assert a["cur_share"] == 0.5 and a["ref_share"] == 0.75
    assert a["share_delta"] == -0.25


def test_purged_backtest_folds(spark):
    """Train rows inside the label-horizon purge gap drop; test rows
    inside the embargo drop; boundaries are inclusive on train/test
    highs and exclusive on the embargo low."""
    import datetime as dt

    from databricks_demo_feature_store_spark.functions.feature_generation import (
        purged_backtest_folds,
    )

    def t(s):
        return dt.datetime.fromisoformat(s)

    rows = [
        (1, t("2024-01-01")),  # train (well before)
        (2, t("2024-01-21")),  # exactly cutoff-10d -> train (inclusive)
        (3, t("2024-01-25")),  # purge gap (label window crosses cutoff)
        (4, t("2024-01-31")),  # cutoff itself: purged too
        (5, t("2024-02-02")),  # embargo (<= cutoff+3d) -> dropped
        (6, t("2024-02-04")),  # test (> cutoff+3d)
        (7, t("2024-03-01")),  # test (<= cutoff+30d)
        (8, t("2024-03-03")),  # beyond horizon -> dropped
    ]
    df = spark.createDataFrame(rows, ["id", "ts"])
    out = {(r["id"], r["split"]) for r in purged_backtest_folds(
        df, "ts", ["2024-01-31"], horizon_days=30,
        label_horizon_days=10, embargo_days=3,
    ).collect()}
    assert out == {(1, "train"), (2, "train"), (6, "test"), (7, "test")}

    import pytest as _p
    with _p.raises(ValueError, match="empty test"):
        purged_backtest_folds(df, "ts", ["2024-01-31"], 5,
                              label_horizon_days=1, embargo_days=5)
