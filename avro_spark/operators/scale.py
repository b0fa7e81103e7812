"""Shuffle-discipline utilities for 100 TB deployments.

Three tools the big-join playbook needs (SCALE.md §1/§4):

* **Bucketed tables** — ``write_bucketed`` persists a table hash-bucketed
  (and sorted) on its join key; two tables bucketed the same way
  sort-merge-join with **no shuffle on either side** (the scan itself is
  the exchange). This is how a 100 TB fact table joins a 10 TB fact
  table repeatedly without re-shuffling 100 TB per query.
* **Salted joins** — ``salted_join`` spreads a skewed hot key over
  ``salt`` sub-keys: the big side gets a deterministic per-row salt,
  the small side is replicated ``salt`` times, and the join key becomes
  (key, salt). Result rows are identical to the plain join; the hot
  key's rows now land on ``salt`` reducers instead of one. AQE's skew
  split handles moderate skew automatically — salting is for the
  pathological single-key case (e.g. the empty-string document hash).
* **Key-spread report** — ``key_skew_report`` measures the actual key
  distribution (top-N heaviest keys + share of total) so salting is a
  measured decision, not a guess. One aggregate pass, map-side combined.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int,
    path: Optional[str] = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed on ``key``.

    ``num_buckets`` should be sized so one bucket of the LARGER table
    fits an executor's memory at join time (bytes / num_buckets ≲ a few
    hundred MB). Both sides of a co-located join must use the same
    ``key`` and ``num_buckets``.
    """
    writer = df.write.format("parquet").mode("overwrite")
    if path is not None:
        writer = writer.option("path", path)
    writer = writer.bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on ``key``. With matching bucket
    specs Spark plans a sort-merge join with no Exchange on either side
    (verify: ``.explain()`` shows no ``Exchange hashpartitioning``)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key, how=how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    salt_col: str = "_salt",
) -> DataFrame:
    """Skew-resistant equi-join: identical rows to ``big.join(small, key,
    how)`` but the shuffle distributes each join key over ``salt``
    reducers.

    The big side's salt must only be *uniform-ish per row*: it mixes
    xxhash64 of the whole row with the per-row monotonic index, so even
    fully-duplicate rows of the hot key (e.g. many empty-document
    hashes) spread over the reducers — a pure row-hash would send every
    duplicate to ONE reducer and defeat the salting. Join RESULTS are
    identical regardless of salt values, so the nondeterministic index
    only affects distribution, never output. The small side is exploded
    ``salt``× — keep it the dimension side. Supports inner and left
    joins (the salted right side would multiply unmatched-right rows,
    so right/full are refused).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    big_s = big.withColumn(
        salt_col,
        # XOR, not +: addition of two arbitrary longs can overflow and
        # raise under ANSI mode
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns]).bitwiseXOR(
                F.monotonically_increasing_id()
            ),
            F.lit(salt),
        ),
    )
    small_s = small.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)]))
    )
    out = big_s.join(small_s, on=[key, salt_col], how=how)
    return out.drop(salt_col)


def key_skew_report(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """(key, n_rows, share) for the ``top`` heaviest keys — the input to
    the salt-or-not decision. Two aggregates, both map-side combined; the
    total is a broadcast-sized scalar joined back in."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(key, "n_rows", (F.col("n_rows") / F.col("_total")).alias("share"))
        .orderBy(F.desc("n_rows"), key)
        .limit(top)
    )


def assign_global_ids(
    df: DataFrame,
    order_by: str,
    id_col: str = "_gid",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Dense, deterministic 0-based global ids in ``order_by`` order —
    WITHOUT the single-task global-sort window (``row_number() OVER
    (ORDER BY ...)`` plans ONE partition: a guaranteed straggler at any
    real scale) and without ``monotonically_increasing_id`` (sparse ids,
    dependent on physical partitioning).

    Shape: range-repartition on the key (the same sampled range exchange
    a distributed sort uses), rank WITHIN each range partition, then add
    per-partition offsets (a cumsum over ≤ #partitions counts — driver
    math on a broadcast-sized list, never data). Ties on ``order_by``
    are broken by xxhash64 of the whole row so ids are stable across
    runs and engines need no physical-order assumption.

    Equivalent to ``row_number() OVER (ORDER BY order_by, tiebreak) - 1``
    at sort-merge cost: one range Exchange + in-partition sorts.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    tb = F.xxhash64(*[F.col(c) for c in df.columns])
    # rank within the range partition WITHOUT a window: a window
    # partitioned by spark_partition_id() is not satisfied by the range
    # exchange, so Catalyst would insert a SECOND (hash) Exchange of the
    # full dataset. sortWithinPartitions + monotonically_increasing_id
    # gives the same in-partition rank from the sorted iterator order —
    # mono ids are partitionId·2^33 + row index, so pid and rank unpack
    # with shifts. The nondeterministic mono projection cannot be
    # reordered below the sort, and the localCheckpoint pins one
    # materialization for both the count pass and the output.
    ranged = (
        df.withColumn("_tb", tb)
        .repartitionByRange(n, F.col(order_by), F.col("_tb"))
        .sortWithinPartitions(F.col(order_by), F.col("_tb"))
    )
    mono = F.monotonically_increasing_id()
    local = (
        ranged.withColumn("_mono", mono)
        .withColumn("_pid", F.shiftrightunsigned(F.col("_mono"), 33).cast("int"))
        .withColumn(
            "_rk", (F.col("_mono").bitwiseAND(F.lit((1 << 33) - 1)) + 1)
        )
        .drop("_mono")
    )
    # per-partition counts: ≤ n rows to the driver (partition METADATA,
    # not data); cache so the count pass and the output share the ranged
    # shuffle instead of recomputing it
    local = local.localCheckpoint(eager=False)
    counts = dict(
        (r["_pid"], r["c"])
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offsets, acc = {}, 0
    for p in sorted(counts):
        offsets[p] = acc
        acc += counts[p]
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("_pid"),
    ) if offsets else F.lit(0)
    return local.withColumn(
        id_col, (off + F.col("_rk") - 1).cast("long")
    ).drop("_tb", "_pid", "_rk")


def estimate_row_bytes(
    df: DataFrame,
    sample_rows: int = 2000,
    fmt: str = "parquet",
) -> float:
    """Measured (not guessed) bytes/row in the target output format:
    write a bounded sample to a temp dir in ``fmt`` and divide actual
    bytes by actual rows — compression-aware, schema-aware, and honest
    about encoding overhead, unlike in-memory size estimates. Driver
    cost is one ``limit(sample_rows)`` job plus a tiny local write."""
    import os
    import shutil
    import tempfile

    sample = df.limit(sample_rows).coalesce(1)
    d = tempfile.mkdtemp(prefix="rowsize_")
    try:
        sample.write.mode("overwrite").format(fmt).save(d)
        n = df.sparkSession.read.format(fmt).load(d).count()
        if n == 0:
            return 0.0
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(d)
            for f in files
            if not f.startswith(("_", "."))
        )
        return total / n
    finally:
        shutil.rmtree(d, ignore_errors=True)


def repartition_for_output(
    df: DataFrame,
    target_bytes: int = 256 << 20,
    n_rows: Optional[int] = None,
    bytes_per_row: Optional[float] = None,
    fmt: str = "parquet",
    by: Optional[str] = None,
) -> DataFrame:
    """Repartition so each output file lands near ``target_bytes`` —
    the "write ~128-512 MB files" discipline every sink in this repo
    documents (file count ≈ task count on the next read; thousands of
    KB-sized files poison 100 TB scans and drive NameNode/listing cost).

    ``n_rows``/``bytes_per_row`` can be passed when already known (e.g.
    from a prior count or a previous run) to skip the measurement jobs.
    ``by`` optionally repartitions BY a column (range-partitions within
    the target count) so downstream readers get clustering too."""
    if bytes_per_row is None:
        bytes_per_row = estimate_row_bytes(df, fmt=fmt)
    if n_rows is None:
        n_rows = df.count()
    if n_rows == 0 or bytes_per_row <= 0:
        return df.coalesce(1)
    want = max(1, round(n_rows * bytes_per_row / target_bytes))
    if by is not None:
        return df.repartitionByRange(want, F.col(by))
    return df.repartition(want)
