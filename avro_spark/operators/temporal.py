"""Temporal joins and rollups (beyond-reference extension).

Spark has no native as-of join, and a naive range join plans as a
broadcast-nested-loop/theta join — O(|L|·|R|) and a guaranteed
100 TB-killer. Both operators here reduce to plain shuffle machinery:

* :func:`asof_join` — the sort-merge formulation: union the two sides,
  one hash shuffle on the join key, one time-ordered window pass with
  ``last(..., ignorenulls=True)`` carrying the most recent right-side
  row forward onto each left row. Cost = one Exchange + one in-partition
  sort, identical to what a built-in sort-merge as-of join would do.
* :func:`range_join` — interval containment via time-bucket expansion:
  each right interval explodes into the coarse buckets it covers, the
  left row computes its single bucket, and the match becomes an
  equi-join on (key, bucket) + an exact containment filter. Each
  matching pair surfaces exactly once (the left row lives in one
  bucket), so no post-join dedup. Shuffle volume = |L| + Σ interval
  spans/bucket, never |L|·|R|.
* :func:`time_rollup` — multi-granularity time_bucket aggregation in a
  single pass via SQL ``GROUPING SETS`` (one shuffle, Catalyst expands
  the sets map-side).

All operators accept raw integer-nanosecond ``ts`` columns (the
testdata's TIMESTAMP(NANOS) parquet read under
``spark.sql.legacy.parquet.nanosAsLong``) and normalize them exactly the
way the streaming/sessionize paths do — integer ``div``, not float
division, because epoch nanos exceed 2^53.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..errors import AvroSparkError


def _as_timestamp(df: DataFrame, ts_col: str) -> DataFrame:
    """bigint nanos → timestamp (µs precision); timestamps pass through."""
    src_type = dict(df.dtypes).get(ts_col)
    if src_type is None:
        raise AvroSparkError(f"no such column: {ts_col}")
    if src_type in ("bigint", "long"):
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    if src_type == "int":
        # a 32-bit int cannot hold epoch nanos; treating it as nanos
        # would collapse every timestamp into early 1970. Seconds vs
        # millis is a guess we refuse to make silently.
        raise AvroSparkError(
            f"int ts column {ts_col!r} is ambiguous (seconds? millis?) — "
            "cast it to timestamp or bigint nanoseconds explicitly"
        )
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: Optional[str] = None,
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the single nearest right row with the
    same key and ``right_ts <= left_ts`` (``backward``, the trading /
    feature-lookup default) or ``right_ts >= left_ts`` (``forward``).
    Ties on the timestamp itself match (inclusive). Unmatched left rows
    keep nulls; with ``tolerance_seconds`` a match further than the
    tolerance is nulled out too.

    Output: every left row + ``<col><suffix>`` for each carried right
    column + ``<right_ts or left_ts><suffix>`` (the matched timestamp).

    Scale: ONE hash shuffle on ``on`` and one in-partition sort — the
    same cost envelope as a sort-merge join. No theta join, no
    broadcast of the big side, no per-key driver loops; skewed keys
    behave exactly like any windowed aggregation (AQE skew handling
    applies to the Exchange).
    """
    if direction not in ("backward", "forward"):
        raise AvroSparkError(f"bad asof direction: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    left = _as_timestamp(left, left_ts)
    right = _as_timestamp(right, right_ts)
    # a NULL right timestamp sorts before everything (ASC NULLS FIRST)
    # and last(ignorenulls) would carry its payload onto every left row
    # with no genuine match — dirty rows must not match anything
    right = right.where(F.col(right_ts).isNotNull())
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(keys) | {right_ts}]
    else:
        missing = [c for c in right_cols if c not in right.columns]
        if missing:
            raise AvroSparkError(f"no such column: {missing[0]}")
        # right_ts always rides along; listing it explicitly must not
        # produce a duplicate alias
        right_cols = [c for c in right_cols if c != right_ts]
    carried = list(right_cols) + [right_ts]  # matched ts rides along
    lpay = [c for c in left.columns if c not in set(keys) | {left_ts}]

    # one unioned layout: keys | _ts | left payload | carried right cols | _side
    lhs = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        *[F.col(c) for c in lpay],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in carried],
        F.lit(1).alias("_side"),
    )
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lpay],
        *[F.col(c).alias(f"_r_{c}") for c in carried],
        F.lit(0).alias("_side"),
    )
    unioned = lhs.unionByName(rhs)

    # time order; right rows sort BEFORE left rows at the same instant so
    # equal timestamps match inclusively. forward = the same scan over
    # reversed time.
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    filled = unioned.select(
        *keys,
        "_ts",
        *lpay,
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in carried
        ],
        "_side",
    ).where(F.col("_side") == 1)

    matched_ts = F.col(f"_m_{right_ts}")
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("_ts").cast("double") - matched_ts.cast("double")
        )
        in_tol = matched_ts.isNotNull() & (gap <= float(tolerance_seconds))
        out_cols = [
            F.when(in_tol, F.col(f"_m_{c}")).alias(f"{c}{suffix}") for c in carried
        ]
    else:
        out_cols = [F.col(f"_m_{c}").alias(f"{c}{suffix}") for c in carried]
    return filled.select(
        *keys, F.col("_ts").alias(left_ts), *lpay, *out_cols
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner-join left rows into right [start, end) intervals with the
    same key (``end_inclusive=True`` for closed intervals). Output: all
    left columns + all right columns (key columns once); right columns
    whose name collides with a left column are suffixed ``_r``.

    Scale: the interval explodes into the ``bucket_seconds`` buckets it
    covers, the left row computes its one bucket, and the join is a
    plain equi-join on (key, bucket) + exact containment filter — never
    a BroadcastNestedLoopJoin. Pick ``bucket_seconds`` near the typical
    interval length: shuffle volume is |L| + Σ ceil(span/bucket) per
    interval. Each matching pair emerges exactly once, so no dedup
    stage follows.
    """
    keys = [on] if isinstance(on, str) else list(on)
    left = _as_timestamp(left, left_ts)
    right = _as_timestamp(_as_timestamp(right, start_col), end_col)
    # disambiguate BEFORE the join: a right payload column named like a
    # left one (e.g. both sides carry 'ts') would make the containment
    # filter raise AMBIGUOUS_REFERENCE
    clash = {
        c for c in right.columns if c not in keys and c in set(left.columns)
    }
    rename = {c: (f"{c}_r" if c in clash else c) for c in right.columns}
    right = right.select(
        *[F.col(c).alias(rename[c]) for c in right.columns]
    )
    start_col = rename.get(start_col, start_col)
    end_col = rename.get(end_col, end_col)

    b = int(bucket_seconds)
    left_b = left.withColumn(
        "_bucket", F.floor(F.col(left_ts).cast("timestamp").cast("long") / b)
    )
    # sequence() of covered buckets, exploded — generates ceil(span/b)+1
    # rows per interval, all JVM-side
    right_b = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / b),
                F.floor(F.col(end_col).cast("long") / b),
            )
        ),
    )
    joined = left_b.join(right_b, keys + ["_bucket"])
    contain = (F.col(left_ts) >= F.col(start_col)) & (
        F.col(left_ts) <= F.col(end_col)
        if end_inclusive
        else F.col(left_ts) < F.col(end_col)
    )
    out = [c for c in joined.columns if c != "_bucket"]
    return joined.where(contain).select(*out)


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    granularities: Sequence[str] = ("hour", "day"),
    group_cols: Sequence[str] = (),
    aggs: Optional[dict[str, str]] = None,
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass, one
    shuffle, every requested granularity — ``GROUPING SETS`` over
    ``date_trunc`` buckets. Output columns: ``granularity`` (the set
    name), ``bucket`` (truncated timestamp), the group columns, and one
    column per aggregate (named ``<agg>_<col>``, plus ``n_rows``).

    ``aggs`` maps column → one of sum/avg/min/max/count.
    """
    allowed = ("second", "minute", "hour", "day", "week", "month", "year")
    for g in granularities:
        if g not in allowed:
            raise AvroSparkError(f"bad granularity: {g}")
    aggs = aggs or {}
    # both the function name and the alias go into hand-built SQL:
    # validate the function against the documented set (anything else is
    # an injection surface / raw ParseException) and backtick the alias
    # so column names with spaces/dots stay legal
    allowed_fns = ("sum", "avg", "min", "max", "count")
    for c, fn in aggs.items():
        if fn not in allowed_fns:
            raise AvroSparkError(f"bad aggregate function: {fn}")
    df = _as_timestamp(df, ts_col)
    gcols = ", ".join(f"`{c}`" for c in group_cols)
    gcols_sel = (gcols + ",") if group_cols else ""
    agg_sql = ", ".join(
        [f"{fn}(`{c}`) AS `{fn}_{c}`" for c, fn in aggs.items()]
        + ["count(*) AS n_rows"]
    )
    # grouping sets need named grouping exprs: pre-project one truncated
    # bucket column per granularity (narrow, codegen'd)
    proj = df.select(
        *[F.col(c) for c in group_cols],
        *[F.col(c) for c in aggs if c not in group_cols],
        *[
            F.date_trunc(g, F.col(ts_col)).alias(f"_b_{g}")
            for g in granularities
        ],
    )
    # unique, cleaned-up view name: a fixed name would clobber/race under
    # concurrent rollups on one SparkSession and leak into the catalog
    import uuid

    view = f"_rollup_proj_{uuid.uuid4().hex}"
    proj.createOrReplaceTempView(view)
    per_set_cols = (", " + gcols) if group_cols else ""
    sets = ", ".join(f"(_b_{g}{per_set_cols})" for g in granularities)
    # GROUPING(_b_g)=0 identifies which set a row came from
    gran_case = " ".join(
        f"WHEN GROUPING(_b_{g}) = 0 THEN '{g}'" for g in granularities
    )
    bucket_expr = "coalesce(" + ", ".join(f"_b_{g}" for g in granularities) + ")"
    sql = f"""
        SELECT CASE {gran_case} END AS granularity,
               {bucket_expr} AS bucket,
               {gcols_sel}
               {agg_sql}
        FROM {view}
        GROUP BY GROUPING SETS ({sets})
    """
    try:
        # the returned DataFrame captures the resolved logical plan, so
        # dropping the view immediately is safe
        return df.sparkSession.sql(sql)
    finally:
        df.sparkSession.catalog.dropTempView(view)


def moving_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    n: int = 3,
    range_seconds: Optional[int] = None,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key trailing-window time-series features: previous value,
    delta, and a moving sum/avg/count over the last ``n`` rows
    (``ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW``), or over a
    trailing event-time interval when ``range_seconds`` is set
    (``RANGE`` on the epoch-microsecond axis — row-count-independent,
    the right frame for irregular event spacing).

    Ordering is (ts, *order_cols); pass a unique tiebreaker (e.g. the
    event id) whenever timestamps can collide, otherwise frame contents
    are nondeterministic. Adds columns: ``prev_value``, ``delta``,
    ``mov_sum``, ``mov_avg``, ``mov_n``.

    Scale: ONE window partitioned by the key — a single hash Exchange +
    in-partition sort, state = the frame (n rows or the interval), the
    same envelope as :func:`asof_join`. Never a global window.
    """
    df = _as_timestamp(df, ts_col)
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w_lag = Window.partitionBy(key_col).orderBy(*order)
    if range_seconds is not None:
        w_frame = (
            Window.partitionBy(key_col)
            .orderBy(F.unix_micros(F.col(ts_col)))
            .rangeBetween(-int(range_seconds) * 1_000_000, 0)
        )
    else:
        if n < 1:
            raise AvroSparkError(f"moving_stats needs n >= 1, got {n}")
        w_frame = w_lag.rowsBetween(-(n - 1), 0)
    v = F.col(value_col)
    return (
        df.withColumn("prev_value", F.lag(v).over(w_lag))
        .withColumn("delta", v - F.col("prev_value"))
        .withColumn("mov_sum", F.sum(v).over(w_frame))
        .withColumn("mov_avg", F.avg(v).over(w_frame))
        .withColumn("mov_n", F.count(v).over(w_frame))
    )
