"""IVF-PQ index scale probe (SCALE.md §4): as the CORPUS grows
×{1, 4, 16} (replicated embeddings with offset ids + a deterministic
per-copy perturbation so geometry stays non-degenerate), compare a
FIXED query batch through

  (a) the persisted IVF-PQ index (``knn_ivfpq_indexed``: partition-
      pruned m-smallint code scan → asymmetric shortlist → exact rerank
      over an id-pruned sidecar read), vs
  (b) the persisted raw IVF index (``knn_ivf_indexed``: partition-
      pruned scan of full d-double rows, exact scoring), vs
  (c) brute force over the whole corpus (the no-index alternative).

Also reports each index's bytes on disk — the claim "m code bytes
instead of d floats" as a measured number at each size. Build time is
paid once, not per query fleet. Warm median-of-3.
Usage: python tools/ivfpq_probe.py
"""
from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avro_spark.functions import ivfpq_index as Q  # noqa: E402
from avro_spark.functions import similarity as S  # noqa: E402
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


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, names in os.walk(path):
        for n in names:
            total += os.path.getsize(os.path.join(root, n))
    return total


def main() -> None:
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base_n = emb.count()
    queries = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    ).localCheckpoint(eager=True)
    print(f"base corpus {base_n} vectors; 16 queries; k=10 nprobe=4 "
          "of 64 centroids; rerank=50")
    for mult in (1, 4, 16):
        parts = [emb]
        for c in range(1, mult):
            # offset ids; rotate the vector by a per-copy scalar so the
            # copies aren't exact duplicates (deterministic)
            parts.append(
                emb.select(
                    (F.col("vec_id") + c * 1_000_000).alias("vec_id"),
                    F.transform(
                        "embedding",
                        lambda x, i: x + F.lit(0.01 * c) * F.cos(i + c),
                    ).alias("embedding"),
                    "label",
                )
            )
        corpus = parts[0]
        for p in parts[1:]:
            corpus = corpus.unionByName(p)
        corpus = corpus.localCheckpoint(eager=True)
        n = corpus.count()
        cents = S.kmeans_centroids(corpus, 64, iters=1)
        books = S.pq_codebooks(corpus, m=8, k=16, refine_iters=1)
        root = tempfile.mkdtemp(prefix=f"ivfpq_probe_{mult}_")
        ivf, pq = f"{root}/ivf", f"{root}/pq"
        t0 = time.monotonic()
        S.write_ivf_index(corpus, cents, ivf)
        t_build_ivf = time.monotonic() - t0
        t0 = time.monotonic()
        Q.write_ivfpq_index(corpus, cents, books, pq)
        t_build_pq = time.monotonic() - t0
        ivf_b = _dir_bytes(ivf + "/data")
        pq_codes_b = _dir_bytes(pq + "/codes")
        pq_raw_b = _dir_bytes(pq + "/raw")

        t_pq = _med(lambda: _noop(Q.knn_ivfpq_indexed(
            spark, pq, queries, k=10, nprobe=4, rerank=50)))
        t_ivf = _med(lambda: _noop(S.knn_ivf_indexed(
            spark, ivf, queries, None, k=10, nprobe=4)))
        t_bf = _med(lambda: _noop(S.knn_bruteforce(
            corpus, queries, k=10)))
        print(
            f"x{mult:<3} n={n:<7} build ivf/pq {t_build_ivf:5.1f}/"
            f"{t_build_pq:5.1f}s | bytes ivf {ivf_b/1e6:7.2f}MB "
            f"pq-codes {pq_codes_b/1e6:6.2f}MB (scan side "
            f"{ivf_b/pq_codes_b:5.1f}x smaller) pq-raw "
            f"{pq_raw_b/1e6:7.2f}MB | probe pq {t_pq:6.3f}s "
            f"ivf {t_ivf:6.3f}s brute {t_bf:6.3f}s"
        )
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
