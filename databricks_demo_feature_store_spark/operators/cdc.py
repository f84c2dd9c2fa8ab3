"""Change-data-capture apply: fold a sequence-ordered change stream
(upserts + deletes) into a base snapshot.

The reference's storage layer exposes MERGE-style upserts
(``notebooks/utils.py:1748-1758`` whenMatchedUpdateAll /
whenNotMatchedInsertAll); a CDC *stream* generalizes that to many changes
per key with an explicit ordering column and a delete operation — the
shape every warehouse ingestion job (Debezium/Delta-CDF/"apply changes
into") needs. Re-expressed Spark-first: one hash aggregation picks each
key's final change, two hash joins splice it into the snapshot. No
windows, no per-key sort of the full history.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    sequence_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a change stream to ``snapshot`` and return the new snapshot.

    ``changes`` carries the snapshot's payload columns plus ``op_col``
    (any non-``delete_op`` value is an upsert) and ``sequence_col`` (a
    monotonically increasing version/LSN per key — commit timestamp,
    offset, …). Per key, ONLY the change with the highest sequence wins
    (intermediate changes are skipped entirely — "apply changes into"
    semantics, not event replay): an upsert replaces/inserts the full
    row, a delete removes the key. Keys never touched by a change pass
    through unchanged.

    Scale shape: the per-key final change is one ``max_by`` hash
    aggregation over the change stream (map-side partial combine — the
    stream collapses to ≤ one row per key BEFORE the shuffle, so a
    hot key's million updates cost one partial per input partition,
    never a per-key sort). The splice is one anti-join (snapshot minus
    touched keys) plus the surviving upserts unioned in — snapshot rows
    move through a single hash join; with a small change set AQE turns
    it into a broadcast. At 100 TB the snapshot never re-sorts and
    never rewrites untouched partitions' DATA — pair with a
    partition-pruned writer for the final sink.

    Requires ``(keys, sequence_col)`` unique within ``changes`` — two
    changes of one key sharing a sequence have no defined order (this is
    validated cheaply inside the same aggregation; a violation raises on
    execution via an ANSI error expression rather than silently picking
    an arbitrary winner).
    """
    keys = list(keys)
    payload = [c for c in snapshot.columns if c not in keys]
    missing = [c for c in payload if c not in changes.columns]
    if missing:
        raise ValueError(f"apply_changes: changes is missing payload columns {missing}")

    final = changes.groupBy(*keys).agg(
        F.max_by(
            F.struct(F.col(op_col).alias("__op"), *[F.col(c) for c in payload]),
            F.col(sequence_col),
        ).alias("__fin"),
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct(F.col(sequence_col)).alias("__nseq"),
        F.count(F.col(op_col)).alias("__nop"),
    )
    # ANSI-mode guards, both checked inside the one aggregation:
    # duplicated (key, sequence) pairs make the winner nondeterministic,
    # and a NULL op would make `__op != delete_op` evaluate to NULL —
    # silently deleting the key — so both fail the job loudly instead
    final = final.select(
        *keys,
        F.when(
            F.col("__n") != F.col("__nseq"),
            F.raise_error(
                F.lit("apply_changes: duplicate (keys, sequence) in change stream")
            ),
        ).when(
            F.col("__nop") != F.col("__n"),
            F.raise_error(
                F.lit(f"apply_changes: NULL {op_col} in change stream")
            ),
        ).otherwise(F.col("__fin")).alias("__fin"),
    )
    untouched = snapshot.join(final.select(*keys), on=keys, how="left_anti")
    upserts = final.filter(F.col("__fin").getField("__op") != F.lit(delete_op)).select(
        *keys, *[F.col("__fin").getField(c).alias(c) for c in payload]
    )
    return untouched.unionByName(upserts.select(*snapshot.columns))
