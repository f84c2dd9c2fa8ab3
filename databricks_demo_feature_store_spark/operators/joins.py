"""Join operators: equi-join, point-in-time (as-of) join, anti-join, month spine.

Parity targets in the reference:

- ``make_join`` — ``src/packages/preprocessing/merge_tables/joins.py:11-112``
- ``point_in_time_join`` — ``joins.py:115-238``
- ``exclude_ids_leftjoin`` — ``joins.py:241-268``
- month-spine cross join — ``notebooks/development/fs_cus_demographic.py:64-113``
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def make_join(
    df_left: DataFrame,
    df_right: DataFrame,
    left_keys: Sequence[str],
    right_keys: Sequence[str] | None = None,
    how: str = "inner",
    drop_na: bool = False,
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join with different-named keys and left-wins duplicate resolution.

    Semantics of the reference's ``make_join`` (``joins.py:11-112``):
    right-side keys are renamed to the left names (:79-87); non-key columns
    present on both sides are kept from the *left* only (:89-94); optional
    ``dropna()`` afterwards (:106-108). Unlike the reference we never run an
    eager ``count()`` for logging, and we expose ``broadcast_right`` for
    small dimension tables (Catalyst auto-broadcasts below the threshold,
    but an explicit hint is free insurance for dims we *know* are small).
    """
    right_keys = list(right_keys or left_keys)
    left_keys = list(left_keys)
    if len(left_keys) != len(right_keys):
        raise ValueError("left_keys and right_keys must have equal length")

    renames = {r: l for r, l in zip(right_keys, left_keys) if r != l}
    if renames:
        df_right = df_right.withColumnsRenamed(renames)

    dup_cols = [
        c for c in df_right.columns if c in df_left.columns and c not in left_keys
    ]
    if dup_cols:
        df_right = df_right.drop(*dup_cols)

    if broadcast_right:
        df_right = F.broadcast(df_right)

    joined = df_left.join(df_right, on=left_keys, how=how)
    if drop_na:
        joined = joined.dropna()
    return joined


def point_in_time_join(
    df_spine: DataFrame,
    df_features: DataFrame,
    keys: Sequence[str],
    spine_time: str,
    feature_time: str,
    feature_cols: Sequence[str] | None = None,
    tolerance_expr: str | None = None,
    feature_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """As-of join: latest feature row at-or-before each spine timestamp.

    Matches the reference's ``point_in_time_join`` (``joins.py:115-238``):
    left join on ``spine.time >= feature.time AND keys equal`` (:213-215),
    then ``row_number()`` over ``partitionBy(keys + spine_time)
    .orderBy(feature_time DESC)`` keeping ``row_num == 1 OR row_num IS
    NULL`` (:229-236) so unmatched spine rows survive with NULL features.

    Scale note: the raw ``>=`` theta join is quadratic per key for long
    histories. This implementation uses the **union + last-value** shape
    instead: tag spine rows and feature rows, union them on the shared key
    + time axis, and carry the latest feature values forward with a
    ``last(ignorenulls=True)`` window. That is one shuffle on ``keys`` and
    strictly linear in rows — it survives a 100× scale-up where the theta
    join would explode. Ties (feature_time == spine_time) resolve to the
    feature row, matching the reference's ``>=``.

    ``tolerance_expr`` (e.g. ``"INTERVAL 90 DAYS"``) optionally discards
    matches older than ``spine_time - tolerance``.

    ``feature_tiebreak`` orders feature rows that share the same
    ``feature_time`` (ascending; the LAST one wins the carry) — this
    makes the result deterministic without a pre-dedup window pass when
    the feature table can hold several rows per (key, time).
    """
    keys = list(keys)
    feature_tiebreak = list(feature_tiebreak)
    if feature_cols is None:
        feature_cols = [
            c for c in df_features.columns if c not in keys and c != feature_time
        ]
    feature_cols = list(feature_cols)

    spine_cols = [c for c in df_spine.columns if c not in keys and c != spine_time]

    # Build a common shape: keys, event time, side tag, payloads from each side.
    # The feature payload is carried as ONE struct so the latest feature ROW
    # wins atomically — per-column last(ignorenulls) would stitch values from
    # different rows whenever a newer feature value is legitimately NULL,
    # diverging from the reference's whole-row row_number semantics.
    right = df_features.select(
        *keys,
        F.col(feature_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__is_spine"),
        F.struct(
            F.col(feature_time).cast("timestamp").alias("__ft"),
            *[F.col(c) for c in feature_cols],
        ).alias("__feat"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(feature_tiebreak)],
    )
    left = df_spine.select(
        *keys,
        F.col(spine_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__is_spine"),
        F.struct(*[F.col(c) for c in ([spine_time] + spine_cols)]).alias(
            "__spine_payload"
        ),
        F.lit(None).cast(right.schema["__feat"].dataType).alias("__feat"),
        *[
            F.lit(None).cast(df_features.schema[c].dataType).alias(f"__tb{i}")
            for i, c in enumerate(feature_tiebreak)
        ],
    )
    right = right.withColumn(
        "__spine_payload",
        F.lit(None).cast(left.schema["__spine_payload"].dataType),
    )

    unioned = left.unionByName(right)

    # Feature rows sort before spine rows at equal time (__is_spine ASC) so a
    # same-instant feature is visible to the spine row, reproducing `>=`;
    # tiebreak columns order same-instant feature rows (last wins).
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_spine").asc(),
            *[F.col(f"__tb{i}").asc_nulls_first() for i in range(len(feature_tiebreak))],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *keys,
        "__is_spine",
        "__spine_payload",
        F.last("__feat", ignorenulls=True).over(w).alias("__feat"),
    )
    carried = carried.select(
        *keys,
        "__is_spine",
        "__spine_payload",
        F.col("__feat").getField("__ft").alias("__matched_ft"),
        *[F.col("__feat").getField(c).alias(c) for c in feature_cols],
    )

    result = carried.filter(F.col("__is_spine") == 1)
    if tolerance_expr is not None:
        too_old = F.col("__matched_ft") < (
            F.col("__spine_payload").getField(spine_time).cast("timestamp")
            - F.expr(tolerance_expr)
        )
        result = result.select(
            *keys,
            "__spine_payload",
            *[
                F.when(too_old, F.lit(None)).otherwise(F.col(c)).alias(c)
                for c in feature_cols
            ],
        )

    out_cols = (
        keys
        + [F.col("__spine_payload").getField(spine_time).alias(spine_time)]
        + [F.col("__spine_payload").getField(c).alias(c) for c in spine_cols]
        + [F.col(c) for c in feature_cols]
    )
    return result.select(*out_cols)


def point_in_time_multi_join(
    df_spine: DataFrame,
    lookups: Sequence[Mapping],
    keys: Sequence[str],
    spine_time: str,
) -> DataFrame:
    """As-of join of MANY feature tables that share the same lookup
    ``keys`` in ONE shuffle — the N-table generalization of
    :func:`point_in_time_join`.

    Each entry of ``lookups`` is a mapping with:

    - ``features``: the feature DataFrame
    - ``feature_time``: its as-of timestamp column
    - ``feature_cols`` (optional): payload columns (default: all non-key,
      non-time columns)
    - ``tolerance_expr`` (optional): e.g. ``"INTERVAL 90 DAYS"`` — matches
      older than ``spine_time - tolerance`` are NULLed for that lookup

    Scale shape: the sequential composition shuffles the (progressively
    wider) spine once PER TABLE — N range exchanges + N windows over N
    copies of the spine. Here every feature table is tagged into ONE
    union on the shared ``(keys, time)`` axis, ONE window partitioned by
    ``keys`` carries each table's latest row forward as its own struct
    (``last(ignorenulls)`` per struct — whole-row atomicity per table,
    independent carries across tables), and spine rows project all N
    matches out. The spine data moves through exactly ONE exchange
    regardless of N — at 100 TB with a 5-table training set that is 5×
    less spine shuffle I/O. Used by
    ``featurestore/training.py create_training_set`` whenever all
    lookups share identical lookup keys.

    Ties (feature_time == spine_time) resolve to the feature row,
    matching the reference's ``>=`` (``joins.py:213-215``). Payload
    column names must be disjoint across lookups (validated).
    """
    keys = list(keys)
    spine_cols = [c for c in df_spine.columns if c not in keys and c != spine_time]
    looks = []
    # seed with the spine's own output columns (keys, spine_time, payload):
    # a feature column named like any of them would silently yield a
    # duplicate output column name — later select-by-name becomes ambiguous
    seen: set[str] = set(df_spine.columns) | set(keys) | {spine_time}
    for i, lk in enumerate(lookups):
        features = lk["features"]
        ftime = lk["feature_time"]
        fcols = lk.get("feature_cols")
        if fcols is None:
            fcols = [c for c in features.columns if c not in keys and c != ftime]
        fcols = list(fcols)
        dup = seen.intersection(fcols)
        if dup:
            raise ValueError(
                f"point_in_time_multi_join: feature columns {sorted(dup)} "
                "collide with the spine's columns/keys or another lookup — "
                "rename before joining"
            )
        seen.update(fcols)
        looks.append(
            {
                "features": features,
                "ftime": ftime,
                "fcols": fcols,
                "tol": lk.get("tolerance_expr"),
                "slot": f"__feat{i}",
            }
        )

    def feat_struct(lk) -> F.Column:
        return F.struct(
            F.col(lk["ftime"]).cast("timestamp").alias("__ft"),
            *[F.col(c) for c in lk["fcols"]],
        )

    # one tagged frame per side, unioned on the shared (keys, time) axis
    sides = []
    spine_payload_t = None
    left = df_spine.select(
        *keys,
        F.col(spine_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__is_spine"),
        F.struct(*[F.col(c) for c in ([spine_time] + spine_cols)]).alias(
            "__spine_payload"
        ),
    )
    spine_payload_t = left.schema["__spine_payload"].dataType
    slot_types = {}
    for lk in looks:
        probe = lk["features"].select(feat_struct(lk).alias(lk["slot"]))
        slot_types[lk["slot"]] = probe.schema[lk["slot"]].dataType
    left = left.select(
        "*",
        *[
            F.lit(None).cast(slot_types[lk["slot"]]).alias(lk["slot"])
            for lk in looks
        ],
    )
    sides.append(left)
    for lk in looks:
        right = lk["features"].select(
            *keys,
            F.col(lk["ftime"]).cast("timestamp").alias("__t"),
            F.lit(0).alias("__is_spine"),
            F.lit(None).cast(spine_payload_t).alias("__spine_payload"),
            *[
                (feat_struct(lk) if other["slot"] == lk["slot"]
                 else F.lit(None).cast(slot_types[other["slot"]]))
                .alias(other["slot"])
                for other in looks
            ],
        )
        sides.append(right)
    unioned = sides[0]
    for s in sides[1:]:
        unioned = unioned.unionByName(s)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__is_spine").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *keys,
        "__is_spine",
        "__spine_payload",
        *[
            F.last(lk["slot"], ignorenulls=True).over(w).alias(lk["slot"])
            for lk in looks
        ],
    ).filter(F.col("__is_spine") == 1)

    st = F.col("__spine_payload").getField(spine_time).cast("timestamp")
    out_feature_cols = []
    for lk in looks:
        slot = F.col(lk["slot"])
        cond = None
        if lk["tol"] is not None:
            cond = slot.getField("__ft") < (st - F.expr(lk["tol"]))
        for c in lk["fcols"]:
            v = slot.getField(c)
            if cond is not None:
                v = F.when(cond, F.lit(None)).otherwise(v)
            out_feature_cols.append(v.alias(c))
    return carried.select(
        *keys,
        F.col("__spine_payload").getField(spine_time).alias(spine_time),
        *[
            F.col("__spine_payload").getField(c).alias(c) for c in spine_cols
        ],
        *out_feature_cols,
    )


def exclude_ids_anti_join(
    df: DataFrame,
    df_exclude: DataFrame,
    keys: Sequence[str],
    exclude_keys: Sequence[str] | None = None,
) -> DataFrame:
    """Drop rows whose keys appear in the exclusion DataFrame.

    Reference: ``exclude_ids_leftjoin`` (``joins.py:241-268``) — distinct
    exclusion keys then ``how="leftanti"`` (:265-266). The ``distinct()`` is
    unnecessary for correctness of an anti-join; we skip it and let Spark
    build the hash set directly (one less shuffle).
    """
    exclude_keys = list(exclude_keys or keys)
    keys = list(keys)
    renames = {e: k for e, k in zip(exclude_keys, keys) if e != k}
    right = df_exclude.select(*exclude_keys)
    if renames:
        right = right.withColumnsRenamed(renames)
    return df.join(right, on=keys, how="left_anti")


def month_spine(
    df_entities: DataFrame,
    entity_keys: Sequence[str],
    start_date: str,
    end_date: str,
    date_col: str = "release_dt",
    open_date_col: str | None = None,
) -> DataFrame:
    """Month-start spine cross-joined to entities.

    The reference builds the month range in driver-side pandas then
    ``CROSS JOIN``s it (``fs_cus_demographic.py:64-113``). We generate the
    range distributed with ``sequence()`` + ``explode`` (no driver work) and
    broadcast the tiny month dim into the cross join. The optional
    ``open_date_col`` filter reproduces the
    ``release_dt >= fecha_apertura`` predicate (:109-113).
    """
    months = (
        df_entities.sparkSession.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.trunc(F.lit(start_date).cast("date"), "month"),
                    F.trunc(F.lit(end_date).cast("date"), "month"),
                    F.expr("INTERVAL 1 MONTH"),
                )
            ).alias(date_col)
        )
    )
    spine = df_entities.select(*entity_keys, *( [open_date_col] if open_date_col else [] )).distinct()
    out = spine.crossJoin(F.broadcast(months))
    if open_date_col:
        out = out.filter(F.col(date_col) >= F.trunc(F.col(open_date_col), "month"))
    return out


def salted_join(
    df_big: DataFrame,
    df_small: DataFrame,
    keys: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join with deterministic key salting for skewed hot keys.

    AQE's skew-join split handles most skew at runtime
    (``spark.sql.adaptive.skewJoin.enabled``); this explicit form is for
    the pathological case AQE can't fix — one reducer key so hot its
    single partition exceeds memory even after splitting. The big side
    gets ``salt = pmod(xxhash64(salt_source or all columns), buckets)``;
    the small side is exploded ``buckets``× (size multiplier — keep the
    small side genuinely small) so every (key, salt) pair matches.
    Deterministic (hash-derived, no rand()), so results are reproducible
    run to run.

    Only ``inner`` and ``left`` joins are supported: the exploded small
    side would emit unmatched right/full-outer rows once per salt bucket.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how in {{'inner', 'left'}}, got {how!r}: "
            "the exploded small side duplicates unmatched right-side rows"
        )
    keys = list(keys)
    salt_cols = (
        [F.col(salt_source)] if salt_source else [F.col(c) for c in df_big.columns]
    )
    big = df_big.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(salt_buckets)).cast("int")
    )
    small = df_small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return big.join(small, on=keys + ["__salt"], how=how).drop("__salt")


def interval_join(
    df_left: DataFrame,
    df_right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float = 0.0,
    upper_seconds: float = 3600.0,
) -> DataFrame:
    """Range (interval) join: pairs where ``right_ts`` falls inside
    ``[left_ts + lower, left_ts + upper]``, equi-matched on ``keys``.

    Net-new vs the reference (its only temporal join is the PIT as-of,
    ``src/packages/preprocessing/merge_tables/joins.py:115-238``); this is
    the bounded-window companion (event attribution, feature windows).

    Scale design — the naive formulation is a theta join (per-key cross
    product then range filter), quadratic in rows per key. Instead the
    time axis is bucketed by the window width: each right row lands in
    exactly ONE bucket, each left row explodes to the (at most two)
    buckets its window can touch, and the join becomes a pure equi-join
    on ``keys + [bucket]`` — hash-partitioned, AQE-splittable, no
    per-key cross product. The exact range predicate then prunes the
    bucket-coarse candidates; bucket membership is unique per right row
    so no post-join dedup is needed.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    if left_ts == right_ts:
        # The post-join range predicate references both timestamp columns
        # by name; identical names would resolve ambiguously after the join
        # (the streaming twin documents the same requirement).
        raise ValueError(
            "interval_join requires distinct timestamp column names; "
            f"rename one side (both are {left_ts!r})"
        )
    keys = list(keys)
    lower_us = int(lower_seconds * 1_000_000)
    upper_us = int(upper_seconds * 1_000_000)
    width_us = max(upper_us - lower_us, 1)

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    left = df_left.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor((l_us + F.lit(lower_us)) / F.lit(width_us)),
                F.floor((l_us + F.lit(upper_us)) / F.lit(width_us)),
            )
        ),
    )
    right = df_right.withColumn("__bkt", F.floor(r_us / F.lit(width_us)))
    return (
        left.join(right, on=keys + ["__bkt"], how="inner")
        .where(
            (r_us >= l_us + F.lit(lower_us)) & (r_us <= l_us + F.lit(upper_us))
        )
        .drop("__bkt")
    )


def asof_join(
    df_spine: DataFrame,
    df_features: DataFrame,
    keys: Sequence[str],
    spine_time: str,
    feature_time: str,
    direction: str = "backward",
    feature_cols: Sequence[str] | None = None,
    tolerance_expr: str | None = None,
    matched_time_col: str | None = None,
) -> DataFrame:
    """Direction-aware as-of join — the pandas ``merge_asof`` surface on
    the engine's linear union+carry machinery.

    ``direction``:

    - ``"backward"``: latest feature row at-or-before the spine time
      (delegates to :func:`point_in_time_join` — identical semantics).
    - ``"forward"``: EARLIEST feature row at-or-after the spine time
      (the mirror carry: same one-shuffle union, window ordered time-
      DESCENDING so the next-following feature row flows backward to
      each spine row).
    - ``"nearest"``: whichever of the two is closer in absolute time;
      exact ties resolve to the backward match (deterministic). Both
      carries come out of ONE union and ONE exchange — the two window
      sorts share the same hash partitioning, so the spine still moves
      through a single shuffle.

    ``tolerance_expr`` (e.g. ``"INTERVAL 2 HOURS"``) bounds the match
    distance on EACH side before the nearest choice is made — an
    out-of-tolerance backward match never shadows an in-tolerance
    forward match. Unmatched spine rows keep NULL features.
    ``matched_time_col`` optionally emits the matched feature timestamp.

    Determinism contract: (keys, feature_time) must be unique in the
    feature table (several feature rows at one instant would make the
    carried row order-dependent) — same contract as ``merge_asof`` needs
    for reproducibility; pre-dedup with a tiebreak when in doubt.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    keys = list(keys)
    if feature_cols is None:
        feature_cols = [
            c for c in df_features.columns if c not in keys and c != feature_time
        ]
    feature_cols = list(feature_cols)
    spine_cols = [c for c in df_spine.columns if c not in keys and c != spine_time]
    dup = set(feature_cols) & set(df_spine.columns)
    if matched_time_col is not None and (
        matched_time_col in df_spine.columns or matched_time_col in feature_cols
    ):
        dup.add(matched_time_col)
    if dup:
        raise ValueError(
            f"asof_join: output columns {sorted(dup)} collide with the "
            "spine's columns — rename before joining"
        )
    if direction == "backward" and matched_time_col is None:
        return point_in_time_join(
            df_spine,
            df_features,
            keys=keys,
            spine_time=spine_time,
            feature_time=feature_time,
            feature_cols=feature_cols,
            tolerance_expr=tolerance_expr,
        )

    right = df_features.select(
        *keys,
        F.col(feature_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__is_spine"),
        F.struct(
            F.col(feature_time).cast("timestamp").alias("__ft"),
            *[F.col(c) for c in feature_cols],
        ).alias("__feat"),
    )
    left = df_spine.select(
        *keys,
        F.col(spine_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__is_spine"),
        F.struct(*[F.col(c) for c in ([spine_time] + spine_cols)]).alias(
            "__spine_payload"
        ),
        F.lit(None).cast(right.schema["__feat"].dataType).alias("__feat"),
    )
    right = right.withColumn(
        "__spine_payload",
        F.lit(None).cast(left.schema["__spine_payload"].dataType),
    )
    unioned = left.unionByName(right)

    # same-instant feature rows must be visible to the spine row in BOTH
    # carries (>= / <= inclusive): features sort before spine at equal __t
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__is_spine").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").desc(), F.col("__is_spine").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carries = []
    if direction in ("backward", "nearest"):
        carries.append(F.last("__feat", ignorenulls=True).over(w_back).alias("__back"))
    if direction in ("forward", "nearest"):
        carries.append(F.last("__feat", ignorenulls=True).over(w_fwd).alias("__fwd"))
    carried = (
        unioned.select(*keys, "__is_spine", "__spine_payload", *carries)
        .filter(F.col("__is_spine") == 1)
    )

    st = F.col("__spine_payload").getField(spine_time).cast("timestamp")

    def _tol_null(side: F.Column, is_back: bool) -> F.Column:
        if tolerance_expr is None:
            return side
        ft = side.getField("__ft")
        out_of_tol = (
            ft < (st - F.expr(tolerance_expr))
            if is_back
            else ft > (st + F.expr(tolerance_expr))
        )
        return F.when(side.isNull() | out_of_tol, F.lit(None)).otherwise(side)

    if direction == "backward":
        chosen = _tol_null(F.col("__back"), True)
    elif direction == "forward":
        chosen = _tol_null(F.col("__fwd"), False)
    else:
        back = _tol_null(F.col("__back"), True)
        fwd = _tol_null(F.col("__fwd"), False)
        d_back = F.unix_micros(st) - F.unix_micros(back.getField("__ft"))
        d_fwd = F.unix_micros(fwd.getField("__ft")) - F.unix_micros(st)
        chosen = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(d_back <= d_fwd, back)  # exact tie -> backward
            .otherwise(fwd)
        )
    picked = carried.select(*keys, "__spine_payload", chosen.alias("__chosen"))
    out_cols = (
        keys
        + [F.col("__spine_payload").getField(spine_time).alias(spine_time)]
        + [F.col("__spine_payload").getField(c).alias(c) for c in spine_cols]
        + [F.col("__chosen").getField(c).alias(c) for c in feature_cols]
    )
    if matched_time_col is not None:
        out_cols.append(F.col("__chosen").getField("__ft").alias(matched_time_col))
    return picked.select(*out_cols)


def scd2_dim_join(
    df_facts: DataFrame,
    df_dim: DataFrame,
    keys: Sequence[str],
    fact_time: str,
    valid_from: str = "effective_from",
    valid_to: str = "effective_to",
    dim_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Temporal fact⋈SCD2-dimension join: attach the dimension version
    whose validity interval ``[valid_from, valid_to)`` contains each
    fact's timestamp (``valid_to`` NULL = current/open version, the
    :func:`databricks_demo_feature_store_spark.operators.history.build_scd2` output shape).
    Facts in a coverage GAP (no version active at their instant) keep
    NULL dimension attributes — the honest answer, not the stale row.

    Scale shape: a direct theta join (``key equal AND from <= ts < to``)
    degrades to a per-key version scan. Instead this rides the linear
    as-of carry (:func:`point_in_time_join`) on ``valid_from`` — one
    hash shuffle of facts + versions, per-key history never multiplies —
    and then applies the ``valid_to`` residual row-locally, nulling the
    carried attributes where the matched version had already expired.
    Non-overlap of versions per key is the SCD2 contract the builder
    (`build_scd2`) guarantees by construction.
    """
    keys = list(keys)
    if dim_cols is None:
        dim_cols = [
            c
            for c in df_dim.columns
            if c not in keys and c not in (valid_from, valid_to)
        ]
    dim_cols = list(dim_cols)
    # valid_to is carried through the PIT join internally, so it
    # collides with a same-named fact column exactly like a dim column
    dup = (set(dim_cols) | {valid_to}) & set(df_facts.columns)
    if dup:
        raise ValueError(
            f"scd2_dim_join: dimension columns {sorted(dup)} collide with "
            "fact columns — rename before joining (duplicate output names "
            "are ambiguous)"
        )
    joined = point_in_time_join(
        df_facts,
        df_dim,
        keys=keys,
        spine_time=fact_time,
        feature_time=valid_from,
        feature_cols=[*dim_cols, valid_to],
    )
    ts = F.col(fact_time).cast("timestamp")
    expired = F.col(valid_to).isNotNull() & (ts >= F.col(valid_to).cast("timestamp"))
    return joined.select(
        *[c for c in df_facts.columns],
        *[
            F.when(expired, F.lit(None)).otherwise(F.col(c)).alias(c)
            for c in dim_cols
        ],
    )


def bloom_filtered_join(
    df_left: DataFrame,
    df_right: DataFrame,
    left_on: str,
    right_on: str,
    how: str = "inner",
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
) -> DataFrame:
    """Semi-join reduction: pre-filter the probe side with a broadcast
    Bloom filter of the build side's keys BEFORE the shuffle join.

    The fact-fact join killer at 100 TB is shuffling probe rows that
    can never match (a selective filter on the build side leaves 1%% of
    keys, but 100%% of the probe still crosses the wire). Engines solve
    this with runtime filters (Spark's own
    ``spark.sql.optimizer.runtime.bloomFilter.enabled`` does it inside
    AQE); this operator is the explicit, engine-portable form over the
    repo's column-algebra Bloom (`operators/sketches.py bloom_build`):

    - ONE pass over the build side's keys folds into a one-row
      ``map<int,bigint>`` filter (a few MB regardless of key count),
    - the probe side crossJoins the broadcast row and keeps rows whose
      key MIGHT be present (codegen'd bit tests at scan speed — no
      shuffle, no Python),
    - the exact join then runs on the reduced probe side. Bloom false
      positives cost only wasted shuffle rows; false negatives cannot
      happen, so the join result is EXACTLY the plain join's.

    Keys of any type are bridged through ``xxhash64`` (both sides hashed
    identically); the ``bloom`` helper column never leaks into the
    output. ``how`` covers inner/left_semi — shapes where dropping
    non-matching probe rows early is semantics-preserving.
    """
    from databricks_demo_feature_store_spark.operators.sketches import (
        bloom_build,
        bloom_might_contain_dense,
    )

    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_filtered_join: how={how!r} not supported — the Bloom "
            "pre-filter drops probe rows, which only preserves inner/"
            "left_semi semantics"
        )
    # mask the hash non-negative: Spark's % keeps the dividend's sign, so
    # a raw xxhash64 would scatter bits to NEGATIVE positions — fine for
    # the sparse map (negative keys round-trip) but out of range for the
    # dense array probe. Same mask on both sides keeps build/probe aligned.
    def _key(c):
        return F.xxhash64(c).bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))

    keys = df_right.select(_key(F.col(right_on)).alias("__bloom_key"))
    bloom = bloom_build(keys, "__bloom_key", n_bits=n_bits, n_hashes=n_hashes)
    # Collect the one-row filter and inject it as a LITERAL dense array —
    # exactly what Spark's own runtime bloom filter does (build, collect
    # at the driver, inject into the probe's scan filter). The literal is
    # evaluated once under codegen; attaching the filter via a crossJoin
    # instead makes every probed UnsafeRow COPY the array bytes (measured
    # 20x slower at 1<<20 bits), and a sparse-map probe pays an O(set
    # words) scan per element_at. Driver traffic = n_bits/8 bytes once.
    word_map = bloom.collect()[0]["bloom"] or {}
    n_words = (n_bits + 63) // 64
    dense = [word_map.get(i, 0) for i in range(n_words)]
    # ONE parsed expression, constant-folded to a single array literal.
    # (F.lit(list) builds the array from n_words separate Column objects —
    # 16k py4j round-trips, measured ~8 s at the default sizing.)
    arr = F.expr("array(" + ",".join(f"{w}L" for w in dense) + ")")
    reduced = df_left.filter(
        bloom_might_contain_dense(
            arr, _key(F.col(left_on)), n_bits=n_bits, n_hashes=n_hashes
        )
    )
    # frame-qualified condition: unqualified F.col(left_on) is ambiguous
    # whenever both sides carry the key under the same name
    return reduced.join(df_right, reduced[left_on] == df_right[right_on], how)
