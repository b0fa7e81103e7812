"""Incremental-dedup scale probe (SCALE.md §3): as the CORPUS grows
×{1, 4, 16} (copies carry per-copy filler tokens so near-dup density
stays constant), compare checking a FIXED daily batch

  (a) against the persisted MinHash index  (probe: batch signature +
      index scan, no corpus re-signature), vs
  (b) by re-running minhash_lsh_pairs over corpus ∪ batch (the
      no-index alternative: re-signatures everything, every day).

Build time is reported once per size — it is paid once, not per batch.
Warm median-of-3. Usage: python tools/dedup_index_probe.py
"""
from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avro_spark.functions import dedup as D  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _med(f) -> float:
    ts = []
    for _ in range(3):
        t0 = time.monotonic()
        f()
        ts.append(time.monotonic() - t0)
    return statistics.median(ts)


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    batch = docs.where(F.col("doc_id") % 97 == 1).select("doc_id", "text")
    n_batch = batch.count()
    for mult in (1, 4, 16):
        corpus = (
            docs.crossJoin(
                spark.range(mult).withColumnRenamed("id", "copy"))
            .select(
                (F.col("doc_id") * mult + F.col("copy") + 1_000_000)
                .alias("doc_id"),
                F.concat_ws(
                    " ", "text",
                    F.concat(F.lit("c"), F.col("copy"), F.lit("_"),
                             F.col("doc_id")),
                ).alias("text"),
            )
        )
        n = corpus.count()
        idx = tempfile.mkdtemp(prefix=f"idxp_{mult}_")
        t0 = time.monotonic()
        D.write_minhash_index(corpus, idx, "doc_id", "text",
                              num_hashes=64, bands=16)
        build = time.monotonic() - t0
        # warm both paths once
        _noop(D.dedup_against_index(spark, batch, idx, "doc_id", "text"))
        probe = _med(lambda: _noop(
            D.dedup_against_index(spark, batch, idx, "doc_id", "text")))
        # r8: the same probe WITHOUT the candidate-id pushdown — the
        # verify stage then streams the whole shingle store
        nopush = _med(lambda: _noop(D.dedup_against_index(
            spark, batch, idx, "doc_id", "text",
            candidate_pushdown=False)))
        # r8: the IO-scaling stat wall time cannot show at MB scale —
        # how many shingle files the pushed `id IN (candidates)` filter
        # touches, given the range-sorted layout (parquet prunes whole
        # files/row-groups whose [min,max] id stats miss the set).
        # Candidates = the pre-verify pair set (threshold 0).
        cand_ids = sorted(
            r[0] for r in D.dedup_against_index(
                spark, batch, idx, "doc_id", "text", threshold=0.0)
            .select("corpus_id").distinct().collect())
        import pathlib

        import pyarrow.parquet as pq

        files = sorted(pathlib.Path(idx, "shingles").glob("*.parquet"))
        touched = 0
        for fpath in files:
            md = pq.ParquetFile(fpath).metadata
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(0).statistics
                if any(st.min <= c <= st.max for c in cand_ids):
                    touched += 1
                    break
        io_stat = f"verify scan {touched}/{len(files)} files "                   f"({len(cand_ids)} candidate ids)"
        union = corpus.unionByName(batch)
        _noop(D.minhash_lsh_pairs(union, "doc_id", "text",
                                  num_hashes=64, bands=16))
        rerun = _med(lambda: _noop(D.minhash_lsh_pairs(
            union, "doc_id", "text", num_hashes=64, bands=16)))
        print(
            f"{mult:3d}x ({n} docs, batch {n_batch}): build-once "
            f"{build:5.2f}s  probe {probe:5.2f}s  "
            f"probe-nopush {nopush:5.2f}s  union-rerun "
            f"{rerun:5.2f}s  ({rerun / probe:4.1f}x)  {io_stat}",
            flush=True,
        )


if __name__ == "__main__":
    main()
