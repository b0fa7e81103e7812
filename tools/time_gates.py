"""Isolated per-gate timing with the bench's exact methodology
(warm-then-median-of-3, noop sink, per-gate clearCache, bench session
config) — the round-10 optimization loop's measure-one-thing tool.

Usage: python tools/time_gates.py <gate> [gate ...]   [--reps N]

Prints one JSON line: {"gate": {"cold": s, "warm": s, "spread": [lo, hi]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from bench import _build_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = _build_session(cpus)
    qs = {**E.queries(), **E.extra_queries()}
    from pyspark.sql import functions as F

    # throwaway JVM warmup (bench.py parity)
    (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select((F.col("n_nationkey") * 2).alias("x"))
        .groupBy().sum("x").write.format("noop").mode("overwrite").save()
    )
    out = {}
    for name in args:
        fn = qs[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name}: cold")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        dts = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{name}: warm {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dts.append(time.perf_counter() - t0)
        dts.sort()
        out[name] = {
            "cold": round(cold, 3),
            "warm": round(dts[len(dts) // 2], 3),
            "spread": [round(dts[0], 3), round(dts[-1], 3)],
        }
        print(name, json.dumps(out[name]), file=sys.stderr)
    spark.stop()
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
