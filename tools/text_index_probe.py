"""Text-index scale probe (SCALE.md §5d): as the CORPUS grows
×{1, 4, 16} (copies carry per-copy filler tokens so term statistics
stay realistic), compare answering a FIXED query set

  (a) against the persisted postings index  (bm25_indexed: bucket
      partition pruning + term IN pushdown, df from the pruned scan,
      N/avgdl from the meta row — no corpus pass), vs
  (b) by re-running bm25_topk over the corpus (the no-index
      alternative: re-tokenizes and re-aggregates everything, every
      query fleet run).

Build time is reported once per size — it is paid once, not per probe.
Warm median-of-3. Usage: python tools/text_index_probe.py
"""
from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avro_spark.functions import retrieval as R  # noqa: E402
from avro_spark.functions import text_index as TI  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

QUERIES = [(1, "hash join"), (2, "window merge batch"), (3, "vector scan"),
           (4, "model training loss"), (5, "data pipeline shuffle")]


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
    qs = spark.createDataFrame(QUERIES, "query_id long, query string")
    print(f"corpus base={docs.count()} queries={len(QUERIES)}  (sf_dir={SF_DIR})")
    for mult in (1, 4, 16):
        corpus = (
            docs.crossJoin(
                spark.range(mult).withColumnRenamed("id", "copy"))
            .select(
                (F.col("doc_id") * mult + F.col("copy")).alias("doc_id"),
                # per-copy filler keeps copies from being exact dups
                F.concat_ws(" ", "text",
                            F.concat(F.lit("copytok"), F.col("copy")))
                .alias("text"),
            )
            .localCheckpoint(eager=True)
        )
        n = corpus.count()
        idx = tempfile.mkdtemp(prefix=f"ti_probe_{mult}x_")
        t0 = time.monotonic()
        TI.write_text_index(corpus, idx, n_buckets=64)
        t_build = time.monotonic() - t0
        t_probe = _med(lambda: _noop(
            TI.bm25_indexed(spark, idx, qs, k=10)))
        # df-capped probe: terms in >5% of docs are skipped via the
        # termstats sidecar BEFORE their postings are read — the
        # stop-term mitigation for stopword-heavy query fleets
        t_capped = _med(lambda: _noop(
            TI.bm25_indexed(spark, idx, qs, k=10, max_df_ratio=0.05)))
        t_rerun = _med(lambda: _noop(
            R.bm25_topk(corpus, qs, k=10)))
        st = TI.text_index_stats(spark, idx)
        print(
            f"x{mult:<2} corpus={n:>7}  build_once={t_build:6.2f}s  "
            f"index_probe={t_probe:6.2f}s  df_capped={t_capped:6.2f}s  "
            f"full_rerun={t_rerun:6.2f}s  "
            f"ratio={t_rerun / t_probe:4.1f}x  "
            f"postings={st['postings_rows']} "
            f"({st['postings_bytes'] / 1e6:.0f} MB)"
        )


if __name__ == "__main__":
    main()
