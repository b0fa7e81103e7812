"""Reproduces the SCALE.md §6b large-single-file OCF rows: whole-file vs
split-read throughput on the JVM engine as ONE file grows past a single
task's decode budget.

Usage: python tools/ocf_scale_probe.py [mult ...]   (default: 64 256)

Builds events × mult (sf0.1 events = 100k rows) into ONE OCF file, then
times whole-file and split reads (4 MB and 16 MB ranges) warm,
median-of-3. The 16 MB row at mult=256 is the split_bytes="auto" shape:
splits ≈ cores, one task wave.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avro_spark.schema import create  # noqa: E402
from avro_spark.sources.avro_ocf import (  # noqa: E402
    read_avro_files,
    write_avro_files,
)

EV_SCHEMA = {
    "type": "record", "name": "Ev",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "user_id", "type": "long"},
        {"name": "value", "type": "double"},
        {"name": "event_type", "type": "string"},
    ],
}


def main(mults: list[int]) -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("ocf-scale-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sch = create(EV_SCHEMA)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for mult in mults:
        big = (
            ev.select("event_id", "user_id", "value", "event_type")
            .crossJoin(spark.range(mult).select(F.col("id").alias("_c")))
            .select(
                (F.col("event_id") * mult + F.col("_c")).alias("event_id"),
                "user_id", "value", "event_type",
            )
            .repartition(1)
        )
        d = tempfile.mkdtemp(prefix=f"ocf_scale_{mult}x_")
        try:
            write_avro_files(big, sch, d)
            fsz = sum(os.path.getsize(f) for f in glob.glob(d + "/part-*"))
            print(f"-- mult={mult}: one file, {fsz / 1e6:.1f} MB")
            cases = [("whole_jvm", {}),
                     ("split_4mb_jvm", {"split_bytes": 4 << 20}),
                     ("split_16mb_jvm", {"split_bytes": 16 << 20}),
                     ("split_auto_jvm", {"split_bytes": "auto"})]
            for label, kw in cases:
                read_avro_files(spark, d, sch, engine="jvm", **kw).count()
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    n = read_avro_files(
                        spark, d, sch, engine="jvm", **kw
                    ).count()
                    ts.append(time.perf_counter() - t0)
                ts.sort()
                print(
                    f"   {label:15s} median {ts[1]:5.2f}s "
                    f"(min {ts[0]:.2f} max {ts[-1]:.2f}) "
                    f"{n / ts[1] / 1e6:5.1f} M rows/s"
                )
        finally:
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [64, 256])
