"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

The reference optimizes its Delta tables for multi-column selective
reads (`OPTIMIZE ... ZORDER BY`, surfaced through `utils.py`'s OPTIMIZE
call; our sink twin is `sources/writers.py compact`). The engine-side
primitive behind that command is the space-filling-curve key: interleave
the bits of several columns so rows close in EVERY dimension land close
in ONE sort order, then range-partition and sort files by that key —
min/max file statistics then prune multi-column predicates instead of
just the leading sort column.

Pure integer bit algebra (shift/and/or) — whole-stage-codegen friendly,
bit-identical in any engine, no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Morton / Z-order key: interleave the low ``bits`` bits of each of
    k non-negative integer columns into one long — output bit
    ``j·k + i`` is bit j of column i, so the key orders rows along the
    Z space-filling curve of the k-dimensional grid.

    Columns must already be non-negative integer surrogates of the
    dimensions (ids, bucket numbers from `bin_by_cutpoints`, days since
    epoch, …) — mapping values to buckets is the caller's choice of
    resolution. Values are masked to ``bits`` (callers should bucket
    into ``[0, 2^bits)``; higher bits are ignored, never an error, so a
    rare outlier degrades locality instead of failing the write).
    ``k · bits`` must fit the 63 usable bits of a long.
    """
    k = len(cols)
    if k < 2:
        raise ValueError("zorder_key needs >= 2 columns (1-D is a plain sort)")
    if k * bits > 63:
        raise ValueError(f"zorder_key: {k} cols x {bits} bits > 63-bit long")
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = c.cast("long")
        for j in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(
                    F.shiftright(v, j).bitwiseAND(F.lit(1)), j * k + i
                )
            )
    return out


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "__zorder",
) -> DataFrame:
    """Rewrite ``df``'s physical layout along the Z-curve of ``cols``:
    compute the Morton key, range-partition on it (contiguous curve
    segments per output file) and sort inside each partition, then drop
    the key. Writing the result gives every file a tight min/max
    bounding box in ALL ``cols`` — the multi-column file-pruning layout
    `OPTIMIZE ZORDER BY` produces, as a plain DataFrame transform.

    One range exchange + local sort; no aggregation, no driver state.
    """
    key = zorder_key([F.col(c) for c in cols], bits=bits)
    with_key = df.select("*", key.alias(key_col))
    parted = (
        with_key.repartitionByRange(num_partitions, key_col)
        if num_partitions is not None
        else with_key.repartitionByRange(key_col)
    )
    return parted.sortWithinPartitions(key_col).drop(key_col)
