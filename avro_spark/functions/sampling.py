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


def split_bucket(id_col: Column, hash_fn=None, modulus: int = 100) -> Column:
    """Stable bucket in [0, modulus) from the row id (id is cast to
    string first so long/int/string ids hash identically). ``hash_fn``
    defaults to ``xxhash64`` (JVM scale path); pass
    :func:`avro_spark.functions.dedup.portable_hash60` for SQL-oracle
    parity. ONE definition of the hashing convention — every sampler
    below derives its keep-set from this expression."""
    if hash_fn is None:
        hash_fn = F.xxhash64
    return F.pmod(hash_fn(id_col.cast("string")), F.lit(modulus))


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


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: "dict[str, float] | float",
    default_fraction: float = 0.0,
    hash_fn=None,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash
    bucket (0–9999, a pure function of the id) falls below
    ``fraction * 10000`` for its stratum. Unlike ``df.sampleBy`` this
    is reproducible across runs, engines, and incremental appends —
    the property a training-data freeze needs.

    ``fractions`` is either one float for every stratum or a
    {stratum_value: fraction} dict (unlisted strata get
    ``default_fraction``). Narrow projection + filter — no shuffle,
    fully pushed into the scan stage.
    """
    bucket = split_bucket(F.col(id_col), hash_fn, modulus=10000)
    if isinstance(fractions, dict):
        thresh: Column = F.lit(int(round(default_fraction * 10000)))
        for val, frac in sorted(fractions.items()):
            thresh = F.when(
                F.col(strata_col) == val, F.lit(int(round(frac * 10000)))
            ).otherwise(thresh)
    else:
        thresh = F.lit(int(round(float(fractions) * 10000)))
    return df.where(bucket < thresh)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    n: int,
    ascending: bool = True,
    keep_rank: bool = False,
) -> DataFrame:
    """Keep at most ``n`` rows per group, deterministically ordered by
    ``order_col`` (ties broken by the order column only, so pick a
    unique one — e.g. doc_id — for full determinism). The C4-style
    per-domain cap that stops one crawl host from dominating a corpus.

    One window partitioned by the group — never a global sort. Groups
    so hot that even their window partition is skewed should be
    pre-aggregated or salted upstream (operators/scale.py)."""
    from pyspark.sql import Window

    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(group_col).orderBy(oc)
    out = df.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= n)
    if keep_rank:
        return out.withColumnRenamed("_rk", "rank")
    return out.drop("_rk")


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    alpha: float = 0.7,
    target_rows: "int | None" = None,
    hash_fn=None,
) -> DataFrame:
    """Temperature-based domain rebalancing: sample domain ``d`` with
    probability proportional to ``n_d**alpha`` (``alpha`` < 1 upweights
    small domains — the standard multilingual/domain-balance sampler).
    ``target_rows`` sets the expected output size (default: the largest
    total for which NO domain would need upsampling — the domain whose
    implied total is smallest is kept whole and the rest downsample;
    for ``alpha`` < 1 that whole-kept domain is the smallest one).
    NULL domains form their own stratum.

    Per-domain keep rate ``r_d = min(1, target · p_d / n_d)`` with
    ``p_d = n_d^alpha / Σ n^alpha``; the keep decision is the same
    deterministic id-hash bucket as :func:`stratified_sample`, so the
    mix is reproducible and a larger target keeps a superset.

    Scale: ONE count aggregate (domain cardinality rows to the driver —
    domains are bounded), then a narrow hash filter with the per-domain
    thresholds as a plan literal. No shuffle of the data itself.
    """
    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if not counts:
        return df
    weights = {d: n ** alpha for d, n in counts.items()}
    total_w = sum(weights.values())
    if target_rows is None:
        # the largest target with every rate <= 1: the min implied total
        target_rows = min(
            counts[d] * total_w / weights[d] for d in counts
        )
    rates = {
        d: min(1.0, target_rows * (weights[d] / total_w) / counts[d])
        for d in counts
    }
    bucket = split_bucket(F.col(id_col), hash_fn, modulus=10000)
    thresh: Column = F.lit(0)
    # NULL sorts via the (is-None, str) key, and its predicate must be
    # isNull() — `col == None` is never true and would silently drop
    # every NULL-domain row
    for d, r in sorted(rates.items(), key=lambda kv: (kv[0] is None, str(kv[0]))):
        cond = F.col(domain_col).isNull() if d is None else F.col(domain_col) == d
        thresh = F.when(cond, F.lit(int(round(r * 10000)))).otherwise(thresh)
    return df.where(bucket < thresh)
