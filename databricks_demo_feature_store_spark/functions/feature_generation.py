"""Feature-generation functions: arithmetic, ratios, CASE categorization,
binarization, constants.

Parity targets in the reference:

- ``math_operations`` — ``src/packages/preprocessing/transformers/feature_generation.py:12-58``
- ``calculate_ratios`` — ``fs_cus_credit_risk.py:472-486`` (NULL on zero denominator)
- ``ratio_column`` — ``fs_cus_credit_risk.py:153-164`` (0 on zero denominator)
- ``calculate_percentages`` — ``fs_cus_credit_risk.py:456-470``
- ``choose_columns_as_value`` — ``feature_generation.py:121-192``
- ``categorize_by_fixed_values`` — ``feature_generation.py:195-284`` (we drop
  its eager ``distinct().collect()`` logging, SURVEY §4.3)
- ``binarize`` — ``feature_generation.py:287-317``
- ``create_unic_value_col`` — ``feature_generation.py:320-345``
"""

from __future__ import annotations

import operator as py_operator
from collections.abc import Mapping, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F

from databricks_demo_feature_store_spark.functions.rounding import dround, floor_quantize

_BINARY_OPS = {
    "add": py_operator.add,
    "sub": py_operator.sub,
    "mul": py_operator.mul,
    "truediv": py_operator.truediv,
    "div": py_operator.truediv,
    "mod": py_operator.mod,
    "pow": py_operator.pow,
}


def math_operations(
    df: DataFrame,
    new_column: str,
    left: str,
    right: str,
    operation: str,
    right_is_literal: bool = False,
) -> DataFrame:
    """Binary column arithmetic via the python ``operator`` module.

    Reference ``feature_generation.py:12-58`` (dispatch :48-57) — the
    operators compile to Column expressions, so this stays JVM-side.
    """
    if operation not in _BINARY_OPS:
        raise ValueError(f"Unsupported operation {operation!r}; use {sorted(_BINARY_OPS)}")
    rhs: Any = F.lit(right) if right_is_literal else F.col(right)
    df_col = _BINARY_OPS[operation](F.col(left), rhs)
    return df.withColumn(new_column, df_col)


def ratio_col(
    numerator: str | Column,
    denominator: str | Column,
    round_to: int = 4,
    zero_denominator_value: float | None = None,
) -> Column:
    """``when(den != 0, round(num/den, r)).otherwise(default)``.

    ``zero_denominator_value=None`` reproduces ``calculate_ratios``
    (``fs_cus_credit_risk.py:472-486``); ``0.0`` reproduces ``ratio_column``
    (:153-164``).
    """
    num = F.col(numerator) if isinstance(numerator, str) else numerator
    den = F.col(denominator) if isinstance(denominator, str) else denominator
    return F.when(
        den.isNotNull() & (den != 0), dround(num / den, round_to)
    ).otherwise(F.lit(zero_denominator_value))


def calculate_ratios(
    df: DataFrame, pairs: Sequence[tuple[str, str]], round_to: int = 4
) -> DataFrame:
    """Add ``{a}_to_{b}_ratio`` for each (numerator, denominator) pair."""
    return df.withColumns(
        {f"{a}_to_{b}_ratio": ratio_col(a, b, round_to) for a, b in pairs}
    )


def calculate_percentages(
    df: DataFrame, pairs: Sequence[tuple[str, str]], round_to: int = 4
) -> DataFrame:
    """Add ``{a}_pct`` = 100 * a / b — ``fs_cus_credit_risk.py:456-470``."""
    return df.withColumns(
        {
            f"{a}_pct": F.when(
                F.col(b).isNotNull() & (F.col(b) != 0),
                dround(F.col(a) * 100.0 / F.col(b), round_to),
            )
            for a, b in pairs
        }
    )


_NULL_KEYWORDS = {"NONE", "NULL", "NA", "N/A", "NAN"}


def _value_expr(value: Any) -> Column:
    if isinstance(value, str) and value.upper() in _NULL_KEYWORDS:
        return F.lit(None)
    return F.lit(value)


def choose_columns_as_value(
    df: DataFrame,
    new_column: str,
    cases: Sequence[Mapping[str, Any]],
    default: Any = None,
    cast_to: str | None = None,
) -> DataFrame:
    """CASE WHEN cond THEN col-or-value ... ELSE default END.

    Reference ``feature_generation.py:121-192`` builds a SQL string; we
    build the Column expression directly (same plan, no string escaping
    risks). Each case is ``{"condition": <sql bool expr>, "column": name}``
    or ``{"condition": ..., "value": literal}``; NULL keywords
    (NONE/NULL/NA/N/A/NAN) map to NULL as in the reference.
    """
    expr: Column | None = None
    for case in cases:
        cond = F.expr(case["condition"])
        then = (
            F.col(case["column"]) if "column" in case else _value_expr(case.get("value"))
        )
        expr = F.when(cond, then) if expr is None else expr.when(cond, then)
    if expr is None:
        raise ValueError("choose_columns_as_value requires at least one case")
    expr = expr.otherwise(_value_expr(default))
    if cast_to:
        expr = expr.cast(cast_to)
    return df.withColumn(new_column, expr)


def categorize_by_fixed_values(
    df: DataFrame,
    column: str,
    new_column: str,
    mapping: Mapping[str, Sequence[Any]],
    default: Any = None,
) -> DataFrame:
    """Map value sets of one column to category labels.

    Reference ``feature_generation.py:195-284`` (minus its eager
    ``distinct().collect()`` debug actions at :263-266, :278-281).
    """
    expr: Column | None = None
    for label, values in mapping.items():
        cond = F.col(column).isin(list(values))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    assert expr is not None
    return df.withColumn(new_column, expr.otherwise(_value_expr(default)))


def binarize(df: DataFrame, expressions: Mapping[str, str]) -> DataFrame:
    """``new_col = f.expr(sql_bool_expr)`` per entry — ``feature_generation.py:287-317``."""
    return df.withColumns({name: F.expr(sql) for name, sql in expressions.items()})


def create_constant_column(
    df: DataFrame, new_column: str, value: Any, cast_to: str | None = None
) -> DataFrame:
    """Constant column — ``feature_generation.py:320-345``."""
    col = F.lit(value)
    if cast_to:
        col = col.cast(cast_to)
    return df.withColumn(new_column, col)


_ALLOWED_SPARK_FUNCS = {
    "abs", "round", "floor", "ceil", "sqrt", "exp", "log", "log10", "pow",
    "greatest", "least", "coalesce", "upper", "lower", "length", "substring",
    "concat", "concat_ws", "split", "regexp_replace", "regexp_extract",
    "to_date", "date_format", "add_months", "datediff", "months_between",
    "trunc", "year", "month", "dayofmonth", "when", "lit", "hash", "md5",
    "sha2", "crc32",
}


def spark_function_operations(
    df: DataFrame,
    new_column: str,
    function: str,
    columns: Sequence[str] = (),
    literals: Sequence[Any] = (),
) -> DataFrame:
    """Escape hatch: arbitrary allowlisted ``pyspark.sql.functions`` by name.

    Reference ``feature_generation.py:61-118`` dispatches any function name;
    we keep the surface but allowlist it (SURVEY §2.10).
    """
    if function not in _ALLOWED_SPARK_FUNCS:
        raise ValueError(f"Function {function!r} not in allowlist")
    fn = getattr(F, function)
    args = [F.col(c) for c in columns] + [F.lit(v) for v in literals]
    return df.withColumn(new_column, fn(*args))


def target_encode(
    df: DataFrame,
    category_col: str,
    target_col: str,
    smoothing: float = 20.0,
    leave_one_out: bool = False,
    out_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Smoothed target encoding of a categorical column — the standard
    high-cardinality categorical feature (per-category mean of the
    target, shrunk toward the global mean):

        enc = (sum_cat + smoothing · global_mean) / (cnt_cat + smoothing)

    ``leave_one_out=True`` excludes each row's OWN target from its
    category statistics ((sum − y) / (cnt − 1) before smoothing) — the
    leakage guard for encoding the training split.

    Scale shape: one hash aggregation on the category (map-side
    combined, DECIMAL-exact sums so the encoding is identical under any
    partitioning), a broadcast 1-row global mean, and one join back —
    category cardinality bounds the joined table, not the fact table.
    NULL targets are excluded from the statistics; NULL categories
    encode to the global mean (they form their own group of unknowns).
    """
    out_col = out_col or f"{category_col}_target_enc"
    t_dec = F.col(target_col).cast("decimal(25,6)")
    stats = df.groupBy(category_col).agg(
        F.sum(t_dec).alias("__sum"),
        F.count(F.col(target_col)).alias("__cnt"),
    )
    glob = F.broadcast(
        df.agg(
            (F.sum(t_dec).cast("double") / F.count(F.col(target_col))).alias(
                "__gmean"
            )
        )
    )
    joined = df.join(stats, on=category_col, how="left").crossJoin(glob)
    if leave_one_out:
        y = F.col(target_col).cast("decimal(25,6)")
        s = F.col("__sum") - F.coalesce(y, F.lit(0).cast("decimal(25,6)"))
        c = F.col("__cnt") - F.col(target_col).isNotNull().cast("long")
    else:
        s, c = F.col("__sum"), F.col("__cnt")
    gmean = F.col("__gmean")
    enc = (
        (s.cast("double") + F.lit(float(smoothing)) * gmean)
        / (c.cast("double") + F.lit(float(smoothing)))
    )
    # floor_quantize, not dround: a sum/count double ratio lands on the
    # 10^-round_to rounding boundaries ~1/2·10^-round_to of the time,
    # where dround's double→DECIMAL cast is engine-dependent (measured
    # last-digit flips vs DuckDB at sf0.1, round 12); the pure-double
    # quantization is bit-identical everywhere and costs nothing
    return joined.select(
        *df.columns,
        floor_quantize(F.coalesce(enc, gmean), round_to).alias(out_col),
    )


def train_test_split_col(
    key: Column,
    test_fraction: float = 0.2,
    val_fraction: float = 0.0,
    seed: int | str = 42,
    buckets: int = 10_000,
) -> Column:
    """Deterministic split label ('train' / 'val' / 'test') from a hash
    of the entity key — no ``rand()``, so the assignment is stable across
    runs, engines and partitionings, and EVERY row of one entity lands in
    the same split (hash the entity key, not the row, to prevent
    entity-level leakage between splits)."""
    from databricks_demo_feature_store_spark.textops.dedup import portable_hash_col

    b = F.pmod(portable_hash_col(key.cast("string"), seed), F.lit(buckets))
    test_hi = int(round(test_fraction * buckets))
    val_hi = test_hi + int(round(val_fraction * buckets))
    return (
        F.when(b < test_hi, F.lit("test"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def attach_global_rank(
    df: DataFrame,
    order: Sequence[Column],
    rank_col: str = "global_rank",
    total_col: str | None = None,
) -> DataFrame:
    """Attach a DISTRIBUTED global ``row_number`` (1..n in the total
    order of ``order``) without ever moving the data to one task — the
    scale-safe replacement for ``row_number().over(Window.orderBy(...))``
    wherever an exact global rank is required (ntile binning, exact-k
    selection, deterministic sharding).

    Shape: ``repartitionByRange`` on the order key gives ordered,
    parallel partitions and ``sortWithinPartitions`` orders each one
    locally; ``monotonically_increasing_id`` (whose lower bits are the
    consecutive record number inside a partition) yields the local rank
    with NO window over the data; per-partition ``(count, min_id)`` — a
    tiny aggregate, one row per partition, map-side combined — turns
    into broadcast cumulative offsets via a broadcast triangular
    self-join over that partition-count-sized frame (O(P²) pairs for P
    shuffle partitions — trivial), so the plan contains NO unpartitioned
    window at all; ``rank = offset + (id - min_id) + 1``. The ranked
    data shuffles EXACTLY once (the range exchange, reused by both
    branches). ``order`` must be a TOTAL order (add tiebreak columns)
    for the rank to be deterministic. ``total_col`` additionally
    attaches the global row count to every row (broadcast, no extra
    pass over the data).
    """
    order = list(order)
    pid, mid, cnt, mn, off, tot = (
        "__gr_pid", "__gr_mid", "__gr_cnt", "__gr_min", "__gr_off",
        "__gr_total",
    )
    local = (
        df.repartitionByRange(*order)
        .sortWithinPartitions(*order)
        .select(
            "*",
            F.spark_partition_id().alias(pid),
            F.monotonically_increasing_id().alias(mid),
        )
    )
    counts = local.groupBy(pid).agg(
        F.count(F.lit(1)).alias(cnt), F.min(mid).alias(mn)
    )
    total = counts.agg(F.sum(cnt).alias(tot))
    a, b = counts.alias("__gr_a"), counts.alias("__gr_b")
    offsets = (
        a.join(
            F.broadcast(b),
            F.col(f"__gr_b.{pid}") < F.col(f"__gr_a.{pid}"),
            "left",
        )
        .groupBy(F.col(f"__gr_a.{pid}").alias(pid), F.col(f"__gr_a.{mn}").alias(mn))
        .agg(F.coalesce(F.sum(F.col(f"__gr_b.{cnt}")), F.lit(0)).alias(off))
        .crossJoin(F.broadcast(total))
    )
    rank = (F.col(off) + (F.col(mid) - F.col(mn)) + F.lit(1)).cast("long")
    extra = [rank.alias(rank_col)]
    if total_col is not None:
        extra.append(F.col(tot).cast("long").alias(total_col))
    return local.join(F.broadcast(offsets), pid).select(*df.columns, *extra)


def attach_global_cumsum(
    df: DataFrame,
    order: Sequence[Column],
    value_cols: Sequence[str],
    prefix: str = "cum_",
) -> DataFrame:
    """Attach DISTRIBUTED global running sums (inclusive prefix sums in
    the total order of ``order``) for each of ``value_cols`` — the
    scale-safe replacement for ``sum(x).over(Window.orderBy(...))``,
    which moves all data to one task.

    Shape: one range exchange orders the partitions; the per-partition
    running sums are a window PARTITIONED by the range-partition id (a
    second, parallel exchange — never SinglePartition); per-partition
    totals (one row per partition, map-side combined) become broadcast
    cumulative offsets via the triangular self-join over the
    partition-count frame; ``global_cumsum = offset + local_running``.
    Used by the exact KS drift statistic (`validation/drift.py`) to
    build full CDFs without a single-partition window. Sums should be
    exact types (longs / DECIMAL) when cross-engine reproducibility
    matters — double addition order differs between partitions.
    """
    from pyspark.sql import Window as W

    order = list(order)
    pid = "__cs_pid"
    local = df.repartitionByRange(*order).select(
        "*", F.spark_partition_id().alias(pid)
    )
    w = (
        W.partitionBy(pid)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run_cols = {c: F.sum(F.col(c)).over(w) for c in value_cols}
    local = local.select(
        "*", *[run_cols[c].alias(f"__cs_run_{c}") for c in value_cols]
    )
    totals = local.groupBy(pid).agg(
        *[F.sum(F.col(c)).alias(f"__cs_tot_{c}") for c in value_cols]
    )
    a, b = totals.alias("__cs_a"), totals.alias("__cs_b")
    offsets = (
        a.join(
            F.broadcast(b),
            F.col(f"__cs_b.{pid}") < F.col(f"__cs_a.{pid}"),
            "left",
        )
        .groupBy(F.col(f"__cs_a.{pid}").alias(pid))
        .agg(
            *[
                F.coalesce(F.sum(F.col(f"__cs_b.__cs_tot_{c}")), F.lit(0)).alias(
                    f"__cs_off_{c}"
                )
                for c in value_cols
            ]
        )
    )
    out_cols = [
        (F.col(f"__cs_off_{c}") + F.col(f"__cs_run_{c}")).alias(f"{prefix}{c}")
        for c in value_cols
    ]
    return local.join(F.broadcast(offsets), pid).select(*df.columns, *out_cols)


def quantile_bin(
    df: DataFrame,
    column: str,
    n_bins: int,
    out_col: str | None = None,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Equal-frequency discretization: bin 1..n_bins by global ``ntile``
    semantics over the value order (ties broken by ``tiebreak_cols`` so
    the assignment is total and deterministic — without a tiebreak,
    equal values at a bin boundary would land arbitrarily).

    Built on :func:`attach_global_rank` (range-partitioned distributed
    rank — the data shuffles once, no single-partition window), then the
    ntile bucket follows arithmetically from ``(rank, total)`` (Spark's /
    DuckDB's larger-groups-first definition: with n rows and k buckets,
    the first ``n % k`` buckets hold ``n div k + 1`` rows). The plan
    survives a 100× scale-up where ``ntile().over(Window.orderBy(...))``
    would move the world to one task. For repeated binning of a fact
    table against a fixed distribution, fit cutpoints once and use
    :func:`assign_bins` (broadcast fold, zero shuffles of the fact
    side).

    NULL values get a NULL bin (matching :func:`assign_bins`) — ranking
    them would silently conflate "missing" with "lowest bucket" and
    skew bin 1's population; the ntile boundaries are computed over the
    non-NULL values only.
    """
    out_col = out_col or f"{column}_qbin{n_bins}"
    order = [F.col(c).asc() for c in [column, *tiebreak_cols]]
    non_null = df.where(F.col(column).isNotNull())
    nulls = df.where(F.col(column).isNull())
    ranked = attach_global_rank(
        non_null, order, rank_col="__qb_rank", total_col="__qb_total"
    )
    r = F.col("__qb_rank")
    n, k = F.col("__qb_total"), F.lit(int(n_bins)).cast("long")
    q = F.floor(n / k).cast("long")
    rem = n % k
    threshold = rem * (q + F.lit(1))
    bucket = F.when(
        r <= threshold,
        F.floor((r + q) / (q + F.lit(1))),  # ceil(r / (q+1))
    ).otherwise(
        rem + F.floor((r - threshold + q - F.lit(1)) / q)
    )
    binned = ranked.select(*df.columns, bucket.cast("int").alias(out_col))
    return binned.unionByName(
        nulls.select(*df.columns, F.lit(None).cast("int").alias(out_col))
    )


def feature_correlations(
    df: DataFrame,
    columns: Sequence[str],
    round_to: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations of the given numeric columns in ONE
    aggregation pass — the collinearity screen before feature selection.
    All C(n,2) ``corr`` aggregates share a single scan with map-side
    partial combine (each keeps 6 moments of state); output is one row
    per (col_a, col_b) pair, a < b."""
    pairs = [
        (a, b)
        for i, a in enumerate(columns)
        for b in list(columns)[i + 1 :]
    ]
    one = df.agg(
        *[
            F.corr(F.col(a).cast("double"), F.col(b).cast("double")).alias(
                f"__c_{i}"
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    per_pair = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                dround(F.col(f"__c_{i}"), round_to).alias("pearson_corr"),
            )
            for i, (a, b) in enumerate(pairs)
        ]
    )
    return one.select(F.explode(per_pair).alias("s")).select("s.*")


def chi2_association(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Chi-square test of association between two categorical columns
    plus Cramér's V (the [0,1]-normalized effect size) — the categorical
    companion to :func:`feature_correlations` for feature selection.
    Returns one row: ``(col_a, col_b, chi2, cramers_v, dof, n)``.

    One contingency aggregation on the (a, b) pair key (map-side
    combined — state is distinct pair count, never rows), broadcast row
    and column margins, and the zero-cell-free identity
    ``χ² = Σ_observed[(o-e)²/e − e] + n`` (unobserved cells contribute
    exactly their expectation, which telescopes into n), so no r×c cell
    materialization is ever needed. NULLs are their own category.
    """
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("__null__"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("__null__"))
    cells = df.groupBy(a.alias("__a"), b.alias("__b")).agg(
        F.count(F.lit(1)).alias("__o")
    )
    row_m = cells.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    col_m = cells.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    tot = cells.agg(
        F.sum("__o").alias("__n"),
        F.count_distinct("__a").alias("__r"),
        F.count_distinct("__b").alias("__c"),
    )
    e = (
        F.col("__ra").cast("double")
        * F.col("__cb").cast("double")
        / F.col("__n").cast("double")
    )
    o = F.col("__o").cast("double")
    term = (o - e) * (o - e) / e - e
    joined = (
        cells.join(F.broadcast(row_m), "__a")
        .join(F.broadcast(col_m), "__b")
        .crossJoin(F.broadcast(tot))
    )
    agg = joined.groupBy("__n", "__r", "__c").agg(F.sum(term).alias("__t"))
    chi2 = F.col("__t") + F.col("__n").cast("double")
    dof = (F.col("__r") - 1) * (F.col("__c") - 1)
    v = F.when(
        dof > 0,
        F.sqrt(
            chi2
            / (
                F.col("__n").cast("double")
                * F.least(F.col("__r") - 1, F.col("__c") - 1).cast("double")
            )
        ),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.lit(col_a).alias("col_a"),
        F.lit(col_b).alias("col_b"),
        dround(chi2, round_to).alias("chi2"),
        dround(v, round_to).alias("cramers_v"),
        dof.cast("int").alias("dof"),
        F.col("__n").cast("long").alias("n"),
    )


def mutual_information(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Mutual information (in nats) between two categorical columns —
    the information-theoretic companion to :func:`chi2_association`
    (chi2 tests existence of association, MI measures its strength in
    bits-like units and handles many-leveled columns more gracefully).
    Returns one row: ``(col_a, col_b, mutual_info, n)``.

    Same scale shape as chi2: one contingency aggregation on the pair
    key, broadcast margins, and only OBSERVED cells contribute
    (``0·ln 0 = 0`` by convention, so zero cells never materialize):
    ``MI = Σ (o/n) · ln(o·n / (ra·cb))``. NULLs are their own category.
    """
    a = F.coalesce(F.col(col_a).cast("string"), F.lit("__null__"))
    b = F.coalesce(F.col(col_b).cast("string"), F.lit("__null__"))
    cells = df.groupBy(a.alias("__a"), b.alias("__b")).agg(
        F.count(F.lit(1)).alias("__o")
    )
    row_m = cells.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    col_m = cells.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    tot = cells.agg(F.sum("__o").alias("__n"))
    o = F.col("__o").cast("double")
    n = F.col("__n").cast("double")
    term = (o / n) * F.log(
        o * n / (F.col("__ra").cast("double") * F.col("__cb").cast("double"))
    )
    joined = (
        cells.join(F.broadcast(row_m), "__a")
        .join(F.broadcast(col_m), "__b")
        .crossJoin(F.broadcast(tot))
    )
    return (
        joined.groupBy("__n")
        .agg(F.sum(term).alias("__mi"))
        .select(
            F.lit(col_a).alias("col_a"),
            F.lit(col_b).alias("col_b"),
            dround(F.col("__mi"), round_to).alias("mutual_info"),
            F.col("__n").cast("long").alias("n"),
        )
    )


def winsorize(
    df: DataFrame,
    columns: Sequence[str],
    lower: float = 0.01,
    upper: float = 0.99,
    suffix: str = "_wins",
) -> DataFrame:
    """Percentile clipping (winsorization) — the outlier guard before
    scaling/encoding: each column is clipped to its own exact
    ``[lower, upper]`` percentiles. Appends ``{col}{suffix}`` columns;
    NULLs pass through.

    Fit-then-apply in one plan: ALL columns' cutpoints come from ONE
    global aggregate row (exact ``percentile`` — Spark and DuckDB share
    the linear-interpolation definition), broadcast via crossJoin, then
    clipping is pure row-local ``least``/``greatest`` — the fact table
    never shuffles.
    """
    fit = df.agg(
        *[
            F.percentile(
                F.col(c).cast("double"),
                F.array(F.lit(float(lower)), F.lit(float(upper))),
            ).alias(f"__w_{c}")
            for c in columns
        ]
    )
    out = df.crossJoin(F.broadcast(fit))
    clipped = [
        F.when(
            F.col(c).isNotNull(),
            F.least(
                F.greatest(F.col(c).cast("double"), F.element_at(f"__w_{c}", 1)),
                F.element_at(f"__w_{c}", 2),
            ),
        ).alias(f"{c}{suffix}")
        for c in columns
    ]
    return out.select(*df.columns, *clipped)


def assign_bins(
    df: DataFrame,
    column: str,
    cutpoints: DataFrame,
    cutpoints_col: str = "cutpoint",
    out_col: str | None = None,
) -> DataFrame:
    """Assign ``bin = 1 + #(cutpoints < value)`` from a FITTED cutpoint
    table — the 100 TB companion to :func:`quantile_bin`: fit cutpoints
    once (exact percentiles on an aggregate, or ``percentile_approx`` on
    the raw data), then bin the fact table with a broadcast of the tiny
    cutpoint set and a per-row fold — no global sort, no shuffle of the
    data being binned. NULL values get a NULL bin.

    Boundary rule: a value EQUAL to a cutpoint falls in the lower bin
    (``value <= cut``), matching ntile's closed-on-the-right buckets.
    """
    out_col = out_col or f"{column}_bin"
    cuts = F.broadcast(
        cutpoints.agg(
            F.array_sort(F.collect_list(F.col(cutpoints_col).cast("double"))).alias(
                "__cuts"
            )
        )
    )
    x = F.col(column).cast("double")
    bin_expr = F.when(
        x.isNotNull(),
        F.lit(1)
        + F.aggregate(
            F.col("__cuts"),
            F.lit(0),
            lambda acc, c: acc + (x > c).cast("int"),
        ),
    )
    return df.crossJoin(cuts).select(*df.columns, bin_expr.alias(out_col))


def backtest_folds(
    df: DataFrame,
    ts_col: str,
    cutoffs: Sequence[str],
    horizon_days: int,
    fold_col: str = "fold",
    split_col: str = "split",
) -> DataFrame:
    """Rolling-origin backtest folds (time-series cross-validation): for
    each cutoff i, rows at or before the cutoff are fold i's ``train``
    split and rows inside ``(cutoff, cutoff + horizon_days]`` its
    ``test`` split — the expanding-window evaluation protocol that
    respects time (a random k-fold would train on the future). Returns
    the long frame: one row per (fold, qualifying row), with rows
    outside both windows dropped.

    ``cutoffs`` are 'YYYY-MM-DD' (or full timestamp) literals — the
    caller names the evaluation dates explicitly, so the plan needs NO
    pre-scan of the data to place fold boundaries. Shape: explode of a
    LITERAL fold array (narrow — no shuffle, no join; the scan is
    re-read once per fold in the same stage) then a range predicate per
    fold. Horizon arithmetic is fixed-duration seconds (day-time
    interval), identical in any engine and timezone."""
    if not cutoffs:
        raise ValueError("backtest_folds requires >= 1 cutoff")
    if horizon_days < 1:
        raise ValueError("backtest_folds requires horizon_days >= 1")
    folds = F.array(
        *[
            F.struct(
                F.lit(i).alias("f"),
                F.to_timestamp(F.lit(str(c))).alias("cut"),
            )
            for i, c in enumerate(cutoffs)
        ]
    )
    ts = F.col(ts_col)
    exploded = df.select("*", F.explode(folds).alias("__fold"))
    cut = F.col("__fold.cut")
    hi = cut + F.expr(f"INTERVAL {int(horizon_days)} DAYS")
    split = (
        F.when(ts <= cut, F.lit("train"))
        .when((ts > cut) & (ts <= hi), F.lit("test"))
    )
    return (
        exploded.select(
            *df.columns,
            F.col("__fold.f").alias(fold_col),
            split.alias(split_col),
        )
        .where(F.col(split_col).isNotNull())
    )


def rfm_segments(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    amount_col: str,
    asof_date: str,
    n_bins: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the classic
    customer-value feature block a feature store serves to marketing and
    churn models: per entity, days since last activity, activity count,
    and DECIMAL-exact spend, each scored 1..``n_bins`` by equal-frequency
    binning, composed into ``rfm_code`` (r·100 + f·10 + m for the default
    5 bins). Higher score = better on every axis (recency is reversed:
    most RECENT activity earns ``n_bins``).

    ``asof_date`` is a literal (``yyyy-MM-dd``) so the plan needs no
    pre-scan of the data to anchor "today".

    Scale shape (single-rank form): ONE hash aggregation collapses the
    fact table to the entity frame (count + max + DECIMAL sum, map-side
    combined); the three ntile scores then share ONE
    :func:`attach_global_rank` pass — the entity frame unpivots to a
    (metric, value, entity) long frame (narrow, 3× entity rows, no
    shuffle), one range exchange ranks all three metrics in a single
    total order with the metric index as the leading key, per-metric
    row counts (a 3-row aggregate) become broadcast offsets, and the
    ntile bucket follows arithmetically (Spark's/DuckDB's
    larger-groups-first definition). One final entity-keyed hash
    aggregation pivots the three scores back — no join back, and the
    fact aggregation is planned exactly once (the naive
    three-×-``quantile_bin`` composition re-plans it six times and
    costs 24 exchanges; this form audits at 8). Ties break on the
    entity id, so every score is deterministic and engine-reproducible.

    Metric values are compared as doubles inside the shared rank —
    exact for day counts, activity counts and DECIMAL(25,2) sums below
    2^53 (beyond that, add higher-precision tiebreaks).
    """
    ent = F.col(entity_col)
    base = (
        df.where(ent.isNotNull())
        .groupBy(ent.alias("entity"))
        .agg(
            F.datediff(
                F.to_date(F.lit(asof_date)), F.max(F.to_date(F.col(ts_col)))
            ).cast("int").alias("recency_days"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.col(amount_col).cast("decimal(25,2)")).alias("__m"),
        )
    )
    q = int(n_bins)
    # Unpivot to (metric_idx, value) long rows carrying the full payload;
    # NULL metric values drop (an absent metric scores NULL, matching
    # assign_bins/quantile_bin semantics) — per-metric counts come from
    # the same long frame, so the arithmetic stays exact under NULLs.
    metrics = [
        F.struct(F.lit(i).alias("__mi"), F.col(c).cast("double").alias("__v"))
        for i, c in enumerate(("recency_days", "frequency", "__m"))
    ]
    long = base.select(
        "entity", "recency_days", "frequency", "__m",
        F.explode(F.array(*metrics)).alias("__metric"),
    ).select(
        "entity", "recency_days", "frequency", "__m",
        F.col("__metric.__mi").alias("__mi"),
        F.col("__metric.__v").alias("__v"),
    ).where(F.col("__v").isNotNull())
    ranked = attach_global_rank(
        long,
        [F.col("__mi").asc(), F.col("__v").asc(), F.col("entity").asc()],
        rank_col="__grank",
    )
    counts = long.groupBy("__mi").agg(F.count(F.lit(1)).alias("__n"))
    a, b = counts.alias("__rf_a"), counts.alias("__rf_b")
    offs = (
        a.join(
            F.broadcast(b),
            F.col("__rf_b.__mi") < F.col("__rf_a.__mi"),
            "left",
        )
        .groupBy(
            F.col("__rf_a.__mi").alias("__mi"),
            F.col("__rf_a.__n").alias("__n"),
        )
        .agg(F.coalesce(F.sum(F.col("__rf_b.__n")), F.lit(0)).alias("__off"))
    )
    scored = ranked.join(F.broadcast(offs), "__mi")
    r = F.col("__grank") - F.col("__off")  # 1..n within the metric
    n, k = F.col("__n"), F.lit(q).cast("long")
    base_sz = F.floor(n / k).cast("long")
    rem = n % k
    threshold = rem * (base_sz + F.lit(1))
    bucket = F.when(
        r <= threshold,
        F.floor((r + base_sz) / (base_sz + F.lit(1))),  # ceil(r / (base+1))
    ).otherwise(
        rem + F.floor((r - threshold + base_sz - F.lit(1)) / base_sz)
    ).cast("int")
    scores = scored.groupBy("entity").agg(
        # payload columns are functionally dependent on entity (every long
        # row of a group carries identical values); max is the visibly
        # deterministic way to pick them back up
        F.max("recency_days").alias("recency_days"),
        F.max("frequency").alias("frequency"),
        F.max("__m").alias("__m"),
        F.max(F.when(F.col("__mi") == 0, bucket)).alias("__rbin"),
        F.max(F.when(F.col("__mi") == 1, bucket)).alias("f_score"),
        F.max(F.when(F.col("__mi") == 2, bucket)).alias("m_score"),
    )
    r_score = (F.lit(q + 1) - F.col("__rbin")).cast("int")
    return scores.select(
        F.col("entity").alias(entity_col),
        "recency_days",
        "frequency",
        F.col("__m").cast("double").alias("monetary"),
        r_score.alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
        (
            r_score * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("int").alias("rfm_code"),
    )


def purged_backtest_folds(
    df: DataFrame,
    ts_col: str,
    cutoffs: Sequence[str],
    horizon_days: int,
    label_horizon_days: int,
    embargo_days: int = 0,
    fold_col: str = "fold",
    split_col: str = "split",
) -> DataFrame:
    """Purged + embargoed rolling-origin folds (the leakage-safe CV for
    labels computed over a FORWARD horizon — de Prado, *Advances in
    Financial ML* ch.7): like :func:`backtest_folds`, but train rows
    whose ``label_horizon_days`` evaluation window crosses the cutoff
    are PURGED (their label peeks into the test period — the subtle
    leak plain time splits miss), and the test window starts after an
    ``embargo_days`` gap (serial correlation immediately after the
    cutoff leaks backward through overlapping features).

    Per fold i with cutoff c:

    - ``train``: ``ts <= c − label_horizon_days`` (every kept train
      row's label window closes at or before the cutoff)
    - ``test``: ``c + embargo_days < ts <= c + horizon_days``
    - rows in the purge gap / embargo gap / beyond the horizon drop.

    Same scale shape as the unpurged form: one literal fold-array
    explode, range predicates, no shuffle, no data pre-scan.
    """
    if not cutoffs:
        raise ValueError("purged_backtest_folds requires >= 1 cutoff")
    if horizon_days < 1 or label_horizon_days < 0 or embargo_days < 0:
        raise ValueError(
            "purged_backtest_folds requires horizon_days >= 1, "
            "label_horizon_days >= 0, embargo_days >= 0"
        )
    if embargo_days >= horizon_days:
        raise ValueError("embargo_days must be < horizon_days (empty test window)")
    folds = F.array(
        *[
            F.struct(
                F.lit(i).alias("f"),
                F.to_timestamp(F.lit(str(c))).alias("cut"),
            )
            for i, c in enumerate(cutoffs)
        ]
    )
    ts = F.col(ts_col)
    exploded = df.select("*", F.explode(folds).alias("__fold"))
    cut = F.col("__fold.cut")
    train_hi = cut - F.expr(f"INTERVAL {int(label_horizon_days)} DAYS")
    test_lo = cut + F.expr(f"INTERVAL {int(embargo_days)} DAYS")
    test_hi = cut + F.expr(f"INTERVAL {int(horizon_days)} DAYS")
    split = (
        F.when(ts <= train_hi, F.lit("train"))
        .when((ts > test_lo) & (ts <= test_hi), F.lit("test"))
    )
    return (
        exploded.select(
            *df.columns,
            F.col("__fold.f").alias(fold_col),
            split.alias(split_col),
        )
        .where(F.col(split_col).isNotNull())
    )
