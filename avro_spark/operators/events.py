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
    (older driver parquet read with nanosAsLong), via the SAME
    normalization helper the temporal operators use — one definition of
    the conversion; 32-bit int ts columns raise (an int cannot hold
    nanos, and guessing seconds-vs-millis would silently corrupt every
    session boundary)."""
    from .temporal import _as_timestamp

    events = _as_timestamp(events, ts_col)
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
