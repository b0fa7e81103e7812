"""Semantic-dedup scale probe (SCALE.md §3): SemDeDup's trade is
explicit — k centroids bound the quadratic pair search to ~n²/k total
work, at the price of never comparing across cluster boundaries. This
probe measures BOTH sides at fixed n: wall time of the full decision
pass and the number of drops found, as k grows (k=1 is the exact
brute-force upper bound: every pair compared, maximum drops, maximum
cost). Warm median-of-3. Usage: python tools/semantic_probe.py
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avro_spark.functions import semantic as SD  # noqa: E402
from avro_spark.functions import similarity as S  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
TAU = 0.4


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
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n = emb.count()
    print(f"n={n} tau={TAU}  (sf_dir={SF_DIR})")
    base_drops = None
    for k in (1, 4, 16, 64):
        cents = (S.kmeans_centroids(emb, k, iters=1)
                 if k > 1 else S.sample_centroids(emb, 1))
        d = SD.semantic_dedup(emb, cents, TAU)
        drops = d.where("NOT keep").count()
        if base_drops is None:
            base_drops = drops  # k=1 compares every pair: ground truth
        t = _med(lambda: SD.semantic_dedup(emb, cents, TAU)
                 .write.format("noop").mode("overwrite").save())
        recall = drops / base_drops if base_drops else 1.0
        print(f"k={k:<3} decision_pass={t:6.2f}s  drops={drops:>4}  "
              f"recall_vs_k1={recall:5.1%}")


if __name__ == "__main__":
    main()
