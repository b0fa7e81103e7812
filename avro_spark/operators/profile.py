"""Table profiling (beyond-reference extension): per-column data-quality
stats — the first thing a pipeline runs against a new 100 TB drop.

One aggregate pass produces one wide row (count/nulls/distinct/min/max
per column), then a driver-side ``stack`` pivots it to one row per
column — the pivot touches k values, never data.

Scale: with ``exact_distinct=False`` (the default) distinct counts use
``approx_count_distinct`` (HyperLogLog++): ONE scan, no Expand, fully
map-side combinable — the only shape that works at 100 TB.
``exact_distinct=True`` switches to exact ``count(DISTINCT col)`` as a
UNION of per-column single-distinct aggregates — each branch a
two-phase hash agg over a column-pruned scan (k parallel stages, one
job), instead of the k-way Expand Catalyst plans for multi-distinct
wide aggregates (k× row multiplication; measured 12× slower).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import AvroSparkError


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, n_distinct, min_str, max_str)
    for each requested column (default: all). min/max are rendered as
    strings so one output schema covers every column type; NaN-bearing
    float columns report NaN per Spark's max semantics."""
    cols = list(columns) if columns is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise AvroSparkError(f"no such columns: {missing}")
    if not cols:
        raise AvroSparkError("profile_table needs at least one column")
    dtypes = dict(df.dtypes)
    if exact_distinct:
        # k exact countDistincts in ONE wide agg plan as an Expand —
        # every input row duplicated k+1 times into a sort aggregate
        # (measured 8.4 s on 6 columns of 600k-row lineitem). A union of
        # per-column single-distinct aggregates keeps each branch a
        # two-phase hash agg on a COLUMN-PRUNED scan: same one job, k
        # parallel stages, no row inflation (0.7 s same table — 12×), and
        # the shape that survives 100 TB. The approx path keeps the
        # single wide pass below (no Expand without true distincts).
        parts = []
        for c in cols:
            col = F.col("`" + c.replace("`", "``") + "`")
            if dtypes[c].startswith("map<"):
                col = F.to_json(col)
            parts.append(
                df.select(col.alias("_c")).agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.count("_c").alias("_nn"),
                    F.countDistinct("_c").alias("n_distinct"),
                    F.min("_c").cast("string").alias("min_str"),
                    F.max("_c").cast("string").alias("max_str"),
                ).select(
                    F.lit(c).alias("column"),
                    F.lit(dtypes[c]).alias("dtype"),
                    "n_rows",
                    (F.col("n_rows") - F.col("_nn")).alias("n_nulls"),
                    "n_distinct",
                    "min_str",
                    "max_str",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        # backtick-quote so names containing dots resolve as top-level
        # columns, not nested-field paths
        col = F.col("`" + c.replace("`", "``") + "`")
        # maps have no ordering (min/max/countDistinct all reject them):
        # profile their canonical JSON rendering instead so an arbitrary
        # drop with map columns still profiles end-to-end
        if dtypes[c].startswith("map<"):
            col = F.to_json(col)
        distinct = F.approx_count_distinct(col)
        aggs += [
            F.count(col).alias(f"_nn{i}"),
            distinct.alias(f"_d{i}"),
            F.min(col).cast("string").alias(f"_mn{i}"),
            F.max(col).cast("string").alias(f"_mx{i}"),
        ]
    wide = df.agg(*aggs)

    def _sq(s: str) -> str:  # SQL single-quote literal escape
        return s.replace("\\", "\\\\").replace("'", "\\'")

    # stack the single wide row into one row per column (k tuples — a
    # constant-size projection, not a data-volume operation)
    stack_args = ", ".join(
        f"'{_sq(c)}', '{_sq(dtypes[c])}', _nn{i}, _d{i}, _mn{i}, _mx{i}"
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, dtype, _nn, n_distinct, min_str, max_str)"
        ),
        F.col("_n").alias("n_rows"),
    ).select(
        "column",
        "dtype",
        "n_rows",
        (F.col("n_rows") - F.col("_nn")).alias("n_nulls"),
        "n_distinct",
        "min_str",
        "max_str",
    )
