"""Event-stream batch analytics (beyond-reference extension).

The streaming module handles live sessionization via ``session_window``
(+watermark); this is the batch twin — gaps-and-islands over historical
events, the standard backfill/replay formulation. One shuffle on the
user key (window functions + the final aggregate share the same
partitioning, so Catalyst plans a single Exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_batch(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """(user, session_id, n_events, session_start, session_end): a new
    session starts when the gap to the previous event of the same user
    exceeds ``gap_seconds``. session_id numbers sessions per user from 0
    in time order — a pure function of the data, so replays and the SQL
    oracle agree exactly.

    Accepts timestamp (incl. NTZ) ts columns, or bigint nanoseconds
    (older driver parquet read with nanosAsLong): a bare bigint→timestamp
    cast would interpret nanos as SECONDS and produce silently wrong
    session boundaries, so integer ts gets the same timestamp_micros
    conversion the streaming path applies."""
    src_type = dict(events.dtypes).get(ts_col)
    if src_type in ("bigint", "long", "int"):
        # integer `div`, not float division: epoch nanos exceed 2^53, where
        # a double divide is off by up to ±1µs vs exact truncation
        events = events.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    secs = F.col(ts_col).cast("timestamp").cast("double")
    w = Window.partitionBy(user_col).orderBy(secs, ts_col)
    new_sess = (
        F.when(secs - F.lag(secs).over(w) > gap_seconds, 1)
        .otherwise(0)
    )
    with_sid = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.sum(new_sess)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
