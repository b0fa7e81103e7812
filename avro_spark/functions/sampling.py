"""Deterministic sampling/split operators for training-data pipelines.

A split must be a pure function of the row id — never `rand()` — so that
re-runs, incremental appends, and multi-table joins all agree on which
side a row lands. One narrow projection, no shuffle, no state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash60


def split_bucket(id_col: Column, hash_fn=None) -> Column:
    """Stable bucket in [0, 100) from the row id (id is cast to string
    first so long/int/string ids hash identically). ``hash_fn`` defaults
    to ``xxhash64`` (JVM scale path); pass
    :func:`avro_spark.functions.dedup.portable_hash60` for SQL-oracle
    parity."""
    if hash_fn is None:
        hash_fn = F.xxhash64
    return F.pmod(hash_fn(id_col.cast("string")), F.lit(100))


def deterministic_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[int] = (80, 10, 10),
    labels: Sequence[str] = ("train", "val", "test"),
    out_col: str = "split",
    hash_fn=None,
) -> DataFrame:
    """Assign every row a split label by hash bucket: weights are integer
    percentages summing to 100, labels line up with cumulative ranges
    (e.g. 80/10/10 → [0,80) train, [80,90) val, [90,100) test)."""
    if len(weights) != len(labels):
        raise ValueError("weights and labels must have equal length")
    if sum(weights) != 100:
        raise ValueError(f"weights must sum to 100, got {sum(weights)}")
    bucket = split_bucket(F.col(id_col), hash_fn)
    expr: Column | None = None
    cum = 0
    for w, lbl in zip(weights, labels):
        cum += w
        cond = bucket < cum
        expr = F.when(cond, lbl) if expr is None else expr.when(cond, lbl)
    return df.withColumn(out_col, expr)
