"""Training-set assembly: point-in-time lookup of feature tables for a
label/spine DataFrame.

This is the Feature Store capability the reference delegates to the
Databricks client (``fs.register_table`` / ``create_training_set``; see
``notebooks/utils.py:1778-1836``) — here re-expressed on the engine's own
scalable as-of join (:func:`point_in_time_join`,
``databricks_demo_feature_store_spark.operators.joins``), which is the union+last_value
linear-shuffle form rather than the reference's quadratic ``>=`` theta join
(``src/packages/preprocessing/merge_tables/joins.py:115-238``).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F

from databricks_demo_feature_store_spark.featurestore.manager import FeatureStoreManager
from databricks_demo_feature_store_spark.operators.joins import (
    point_in_time_join,
    point_in_time_multi_join,
)


@dataclass(frozen=True)
class FeatureLookup:
    table: str
    lookup_keys: tuple[str, ...]
    feature_names: tuple[str, ...] = ()  # empty = all non-key columns
    tolerance: str | None = None  # e.g. "INTERVAL 90 DAYS"


@dataclass(frozen=True)
class WindowLookup:
    """A trailing-window aggregate feature view (the Feast/Tecton
    "window aggregation" shape): per spine row, exact sums/counts of the
    table's EVENT rows over one or more trailing windows anchored at the
    spine timestamp — half-open ``[t - w, t)``, leakage-safe.

    ``windows`` is ``((suffix, interval), ...)``; ``sum_cols`` is
    ``((output_name, SQL expression), ...)`` (conditional measures
    welcome); each output lands as ``{name}_{suffix}``. The event-time
    column comes from the table's registry ``timestamp_keys`` like every
    other lookup."""

    table: str
    lookup_keys: tuple[str, ...]
    windows: tuple[tuple[str, str], ...]
    sum_cols: tuple[tuple[str, str], ...] = ()
    count_col: str | None = None
    scale: int = 2

    def output_names(self) -> list[str]:
        names = []
        for sfx, _interval in self.windows:
            names.extend(f"{out}_{sfx}" for out, _src in self.sum_cols)
            if self.count_col is not None:
                names.append(f"{self.count_col}_{sfx}")
        return names


def create_training_set(
    manager: FeatureStoreManager,
    spine: DataFrame,
    lookups: Sequence[FeatureLookup | WindowLookup],
    spine_time: str,
    strategy: str = "auto",
) -> DataFrame:
    """Left-join each feature table onto the spine as-of ``spine_time``;
    :class:`WindowLookup` entries additionally attach trailing-window
    aggregates of their table's event rows anchored at the spine
    timestamps (each window lookup is one prefix-sum union shuffle —
    `operators/windows.py trailing_multi_window_features`).

    For every lookup the feature table's own timestamp key (from registry
    metadata) is used as the as-of time; the latest feature row at or
    before the spine timestamp wins; spine rows with no history keep NULL
    features (reference PIT semantics, ``joins.py:229-236``).

    ``strategy``:

    - ``"auto"`` (default): when EVERY lookup shares the same
      ``lookup_keys``, all tables join in ONE shuffle via
      :func:`point_in_time_multi_join` — the spine moves through one
      exchange instead of one per table (5× less spine shuffle I/O for
      a 5-table training set). Mixed keys fall back to the sequential
      chain per key.
    - ``"sequential"``: always chain single-table PIT joins (one
      shuffle per table) — useful to compare plans or to stage
      per-table tolerances during debugging.
    - ``"multi"``: require the one-shuffle form (raises on mixed keys).

    Payload column names must be disjoint across lookups AND from the
    spine's own columns under EVERY strategy — a collision is validated
    up front and raises (the sequential chain would otherwise emit a
    duplicate output column name, an ambiguous frame downstream, not a
    usable result). Rename feature columns before assembling.
    """
    if strategy not in ("auto", "sequential", "multi"):
        raise ValueError(f"strategy must be auto|sequential|multi, got {strategy!r}")

    window_lookups = [lk for lk in lookups if isinstance(lk, WindowLookup)]
    lookups = [lk for lk in lookups if not isinstance(lk, WindowLookup)]

    def resolve(lk: FeatureLookup) -> tuple[DataFrame, str]:
        meta = manager.get_metadata(lk.table)
        ts_keys = meta.get("timestamp_keys") or []
        if not ts_keys:
            raise ValueError(
                f"Feature table {lk.table!r} has no timestamp_keys in its registry metadata"
            )
        return manager.read(lk.table), ts_keys[0]

    same_keys = len({tuple(lk.lookup_keys) for lk in lookups}) == 1
    if strategy == "multi" and not same_keys:
        raise ValueError(
            "strategy='multi' requires every lookup to share the same lookup_keys"
        )

    resolved = []
    for lk in lookups:
        features, ftime = resolve(lk)
        fcols = list(lk.feature_names) or [
            c for c in features.columns if c not in lk.lookup_keys and c != ftime
        ]
        resolved.append((lk, features, ftime, fcols))

    # validate payload-name disjointness up front for EVERY strategy: the
    # sequential chain would otherwise emit duplicate output column names
    # (both the spine-carried copy and the new feature copy), an ambiguous
    # frame downstream — not a usable result
    seen: dict[str, str] = {c: "the spine" for c in spine.columns}
    for lk, _features, _ftime, fcols in resolved:
        for c in fcols:
            if c in seen:
                raise ValueError(
                    f"create_training_set: feature column {c!r} from table "
                    f"{lk.table!r} collides with {seen[c]} — rename before "
                    "assembling"
                )
            seen[c] = f"table {lk.table!r}"
    for wl in window_lookups:
        for c in wl.output_names():
            if c in seen:
                raise ValueError(
                    f"create_training_set: windowed feature column {c!r} from "
                    f"table {wl.table!r} collides with {seen[c]} — rename "
                    "before assembling"
                )
            seen[c] = f"window lookup on table {wl.table!r}"

    def apply_window_lookups(frame: DataFrame) -> DataFrame:
        from databricks_demo_feature_store_spark.operators.windows import (
            trailing_multi_window_features,
        )

        for wl in window_lookups:
            events, etime = resolve(
                FeatureLookup(table=wl.table, lookup_keys=wl.lookup_keys)
            )
            frame = trailing_multi_window_features(
                frame,
                events,
                keys=list(wl.lookup_keys),
                spine_time=spine_time,
                event_time=etime,
                windows=list(wl.windows),
                sum_cols=list(wl.sum_cols),
                count_col=wl.count_col,
                scale=wl.scale,
            )
        return frame

    if not lookups:
        return apply_window_lookups(spine)

    if same_keys and len(lookups) > 1 and strategy in ("auto", "multi"):
        entries = [
            {
                "features": features,
                "feature_time": ftime,
                "feature_cols": fcols,
                "tolerance_expr": lk.tolerance,
            }
            for lk, features, ftime, fcols in resolved
        ]
        return apply_window_lookups(
            point_in_time_multi_join(
                spine,
                entries,
                keys=list(lookups[0].lookup_keys),
                spine_time=spine_time,
            )
        )

    out = spine
    for lk, features, ftime, fcols in resolved:
        out = point_in_time_join(
            out,
            features,
            keys=list(lk.lookup_keys),
            spine_time=spine_time,
            feature_time=ftime,
            feature_cols=fcols,
            tolerance_expr=lk.tolerance,
        )
    return apply_window_lookups(out)


def latest_features(
    features: DataFrame,
    primary_keys: Sequence[str],
    timestamp_key: str,
    as_of: str | None = None,
) -> DataFrame:
    """Online-serving snapshot: the latest feature row per entity,
    optionally as of a fixed timestamp — what an online store would
    materialize for low-latency lookups (the batch twin of the Databricks
    ``publish_table`` online sync).

    One ``max_by`` hash aggregation — map-side partial combine collapses
    each entity's history before the shuffle, so the exchange carries one
    row per (entity, partition), NOT the history; a row_number window
    would shuffle and sort every historical row. At 100 TB the feature
    table is already partitioned by the timestamp key, so an ``as_of``
    snapshot prunes future partitions at scan time.

    Requires (primary_keys, timestamp_key) unique — the feature-table
    contract the manager's primary-key spec enforces; ties would
    otherwise pick an arbitrary row.
    """
    pks = [k for k in primary_keys if k != timestamp_key]
    f = features
    if as_of is not None:
        f = f.filter(
            F.col(timestamp_key) <= F.lit(as_of).cast("timestamp")
        )
    payload = [c for c in f.columns if c not in pks]
    agg = f.groupBy(*pks).agg(
        F.max_by(
            F.struct(*[F.col(c) for c in payload]), F.col(timestamp_key)
        ).alias("__latest")
    )
    return agg.select(*pks, "__latest.*")


def negative_samples(
    interactions: DataFrame,
    user_col: str,
    item_col: str,
    items: DataFrame,
    k: int,
    seed: int | str = "neg",
    oversample: int = 4,
) -> DataFrame:
    """Deterministic uniform NEGATIVE sampling for recommender / ranking
    training pairs: for every user with at least one interaction, up to
    ``k`` items the user has NOT interacted with, drawn uniformly from
    the ``items`` dimension — the contrastive counterpart every implicit-
    feedback trainer needs next to its positives. Returns
    ``(user, item, slot)`` with ``slot`` the draw index that produced
    the pair (stable, replayable ordering).

    Scale shape — the naive form (user × item cartesian, anti-join, rank)
    is O(U·I) and dead at any scale. Here each user gets
    ``k·oversample`` hash-indexed DRAW SLOTS (a literal-array explode,
    no shuffle): slot i draws item index ``hash60(seed, user, i) mod n``
    — candidates are O(U·k), independent of item-dimension size. The
    index joins the positionally-ranked item dimension (one shuffle, or
    a broadcast when the dim is small), positives drop with one
    anti-join, same-item re-draws collapse to their FIRST slot, and a
    per-user window (k·oversample rows per user, never the item dim)
    keeps the first ``k`` survivors in slot order. Deterministic across
    runs, partitionings and engines (md5-based portable hash).

    A user whose draws all collide with positives/other draws can emit
    fewer than ``k`` negatives — raise ``oversample`` (the miss
    probability decays geometrically in it).

    The item count ``n`` is read with one ``count()`` of the item
    dimension (metadata-scale action; the modulo needs a literal).
    """
    if k < 1:
        raise ValueError("negative_samples requires k >= 1")
    if oversample < 1:
        raise ValueError("negative_samples requires oversample >= 1")
    from databricks_demo_feature_store_spark.functions.feature_generation import (
        attach_global_rank,
    )
    from databricks_demo_feature_store_spark.textops.dedup import portable_hash_col

    n = items.select(item_col).distinct().count()
    if n == 0:
        raise ValueError("negative_samples: empty item dimension")
    m = int(k) * int(oversample)
    indexed = attach_global_rank(
        items.select(item_col).distinct(),
        [F.col(item_col).asc()],
        rank_col="__rk",
    ).select((F.col("__rk") - 1).alias("__idx"), F.col(item_col).alias("__item"))
    users = interactions.select(F.col(user_col).alias("__u")).distinct()
    cand = users.select(
        "__u", F.explode(F.array(*[F.lit(i) for i in range(m)])).alias("slot")
    ).select(
        "__u",
        "slot",
        F.pmod(
            portable_hash_col(
                F.concat(F.col("__u").cast("string"), F.lit(":"), F.col("slot").cast("string")),
                seed=seed,
            ),
            F.lit(n),
        ).alias("__idx"),
    )
    drawn = cand.join(F.broadcast(indexed) if n <= 1_000_000 else indexed, "__idx")
    pos = interactions.select(
        F.col(user_col).alias("__u"), F.col(item_col).alias("__item")
    ).distinct()
    neg = drawn.join(pos, ["__u", "__item"], "left_anti")
    firsts = neg.groupBy("__u", "__item").agg(F.min("slot").alias("slot"))
    w = Window.partitionBy("__u").orderBy(F.col("slot").asc())
    return (
        firsts.select("__u", "__item", "slot", F.row_number().over(w).alias("__rn"))
        .where(F.col("__rn") <= int(k))
        .select(
            F.col("__u").alias(user_col),
            F.col("__item").alias(item_col),
            F.col("slot").cast("int").alias("slot"),
        )
    )


def refresh_training_set(
    spine: DataFrame,
    old_training: DataFrame,
    features_old: DataFrame,
    features_new: DataFrame,
    keys: Sequence[str],
    spine_time: str,
    feature_time: str,
    feature_cols: Sequence[str] | None = None,
    tolerance_expr: str | None = None,
) -> DataFrame:
    """Incrementally refresh an assembled training set after a feature
    table changes version: spine rows whose entity's feature HISTORY
    differs between ``features_old`` and ``features_new`` get their PIT
    lookup recomputed against the new version; every other row of
    ``old_training`` is kept untouched. The PIT lookup is per-entity
    decomposable (an entity's as-of match depends only on that entity's
    history), so the result equals a full reassembly — the driver gate
    proves that equality against a full-recompute oracle rather than
    assuming it.

    Changed entities are found with a symmetric row difference
    (``exceptAll`` both ways) over (keys, time, payload) — the parquet
    twin of reading a Delta CDF — then collapsed to a distinct key set.
    Scale shape: the diff touches the two feature versions (each one
    hash shuffle), the recompute runs the union+last_value PIT on the
    CHANGED SLICE of the spine only (semi-join pruned; AQE turns the
    prune and the keep-side anti-join into broadcasts when the change
    set is small — no explicit hint, because a backfill touching most
    entities must degrade to a shuffle join instead of OOMing the
    driver on an entity-cardinality broadcast), and the kept rows move
    through an anti-join — at a typical daily change rate the refresh
    is a small fraction of reassembly.
    """
    keys = list(keys)
    from databricks_demo_feature_store_spark.operators.joins import (
        point_in_time_join,
    )

    cols = (
        [*keys, feature_time, *(feature_cols or [])]
        if feature_cols is not None
        else None
    )
    old_rows = features_old.select(*cols) if cols else features_old
    new_rows = features_new.select(*cols) if cols else features_new
    changed = (
        old_rows.exceptAll(new_rows)
        .unionByName(new_rows.exceptAll(old_rows))
        .select(*keys)
        .distinct()
    )
    spine_changed = spine.join(changed, on=keys, how="left_semi")
    recomputed = point_in_time_join(
        spine_changed,
        features_new,
        keys=keys,
        spine_time=spine_time,
        feature_time=feature_time,
        feature_cols=list(feature_cols) if feature_cols else None,
        tolerance_expr=tolerance_expr,
    )
    kept = old_training.join(changed, on=keys, how="left_anti")
    return kept.unionByName(recomputed.select(*old_training.columns))
