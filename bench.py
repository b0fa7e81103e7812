"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing includes full execution (write-discard of every result row) —
plan build + scan + transform. Mirroring the reference's benchmark.lua
(which compiles each schema before a timed loop of 10M warm
iterations, benchmark.lua:78-123), each query first runs once
unmeasured so Catalyst analysis + Janino codegen are warm; the timed
run then measures the steady-state data path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402

# headline set: every oracle-checked operator + the LSH/IVF scale paths
BENCH_QUERIES = [
    "flatten_nested",
    "unflatten_roundtrip",
    "defaults_fill",
    "evolution_reorder_rename",
    "evolution_downgrade",
    "service_fields",
    "promotions",
    "enum_codes",
    "enum_roundtrip",
    "union_encode",
    "enum_evolution",
    "union_evolution",
    "array_evolution",
    "xflatten_update",
    "avro_roundtrip",
    "avro_ocf_roundtrip",
    "conform",
    "text_stats",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "winnow",
    "dedup_exact",
    "ngram_jaccard",
    "knn_bruteforce",
    "minhash_lsh",
    "simhash",
    "cosine_lsh",
    "knn_ivf",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("avro_spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    # Warm pass at the SAME scale factor: identical plan shapes (AQE picks
    # the same join strategies), so Janino codegen and shuffle machinery
    # are warm — mirroring the reference protocol, which times 10M warm
    # iterations of each compiled op (benchmark.lua:102-123).
    for name in BENCH_QUERIES:
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    # drop accumulated broadcast/shuffle refs so GC pauses don't land
    # inside the timed loop
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    time.sleep(1)
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
