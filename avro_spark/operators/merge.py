"""Incremental snapshot merge (beyond-reference extension): latest-wins
upsert/delete of a change batch into a keyed base table — the
incremental-ingest step that keeps a 100 TB curated corpus current
without rewriting it from scratch.

Semantics (the classic CDC MERGE):

* changes carry an ``op`` column: ``'upsert'`` replaces/inserts the
  row for its key, ``'delete'`` removes it.
* within one change batch, the row with the highest ``version`` per
  key wins (ties break on op: delete beats upsert at equal version, so
  a delete-then-reinsert pipeline must bump the version — documented
  determinism over silent arbitrary choice).
* base rows not touched by the batch pass through unchanged.

Design for 100 TB:

* ONE shuffle on the merge key for the change-batch dedup window, then
  LEFT ANTI join + union — deliberately NOT a full outer join, which
  Spark can never broadcast: the anti join broadcasts its (small)
  change-key side, so the 100 TB base streams through with no shuffle
  at all (AQE does this automatically under the threshold; pass
  ``broadcast_changes=True`` to force it).
* The base table is never windowed or sorted. With a bucketed base
  (operators/scale.py write_bucketed) even a shuffle anti join
  co-locates and the base side needs no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import AvroSparkError

UPSERT = "upsert"
DELETE = "delete"


def latest_changes(
    changes: DataFrame,
    key: str,
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Collapse a change batch to one winning row per key: highest
    version wins; at equal version a delete beats an upsert, and two
    upserts at the same version tie-break on a stable hash of the full
    row — the winner must not depend on partition scan order, or a
    foreachBatch retry could write a different snapshot than the first
    attempt. One window partitioned by the key."""
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(),
        # delete sorts before upsert at equal version
        F.when(F.col(op_col) == DELETE, 0).otherwise(1).asc(),
        F.xxhash64(F.struct(*[F.col(c) for c in changes.columns])).asc(),
    )
    return (
        changes.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def merge_snapshot(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    version_col: str = "version",
    op_col: str = "op",
    broadcast_changes: bool = False,
) -> DataFrame:
    """Apply a change batch to a keyed base snapshot and return the new
    snapshot (same columns as ``base``).

    ``changes`` must contain every ``base`` column plus ``op`` and
    ``version`` (delete rows may carry NULL payload columns — only
    their key matters)."""
    missing = set(base.columns) - set(changes.columns)
    if missing:
        raise AvroSparkError(
            f"changes missing base columns: {sorted(missing)}"
        )
    if op_col not in changes.columns or version_col not in changes.columns:
        raise AvroSparkError(f"changes needs '{op_col}' and '{version_col}' columns")
    winners = latest_changes(changes, key, version_col, op_col)
    # runtime guard: an unrecognized op (producer typo, 'UPSERT',
    # 'update') must FAIL the merge, not anti-join the key out of the
    # base and silently delete it
    winners = winners.withColumn(
        op_col,
        F.when(F.col(op_col).isin(UPSERT, DELETE), F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"bad {op_col} value in change batch: "),
                    F.col(op_col),
                )
            )
        ),
    )
    # anti-join + union, NOT a full outer join: Spark cannot broadcast
    # either side of a full outer join, but a LEFT ANTI join broadcasts
    # its right side — so the 100 TB base streams through untouched
    # against a broadcast key set, and the new rows are a plain union.
    touched_keys = winners.select(key)
    if broadcast_changes:
        touched_keys = F.broadcast(touched_keys)
    untouched = base.join(touched_keys, key, "left_anti")
    upserts = winners.where(F.col(op_col) == UPSERT).select(*base.columns)
    return untouched.unionByName(upserts)
