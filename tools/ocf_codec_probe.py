"""OCF block-codec probe (SCALE.md §6e): write ONE large events-derived
file per codec, then JVM split-read it — median-of-3 warm — plus the
compressed size on disk. Reproduces the codec rows in SCALE.md.

Usage: python tools/ocf_codec_probe.py [multiple]   (default 64×)
"""
from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import avro_spark  # noqa: E402
from avro_spark.sources.avro_ocf import (  # noqa: E402
    read_avro_files_split, write_avro_files,
)
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    big = (
        ev.crossJoin(spark.range(mult).withColumnRenamed("id", "copy"))
        .select(
            (F.col("event_id") * mult + F.col("copy")).alias("event_id"),
            (F.col("user_id") + F.col("copy") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
        )
    )
    sch = avro_spark.create(
        {
            "type": "record",
            "name": "Ev",
            "fields": [
                {"name": "event_id", "type": "long"},
                {"name": "user_id", "type": "long"},
                {"name": "event_type", "type": "string"},
                {"name": "value", "type": "double"},
            ],
        }
    )
    n = big.count()
    # r8: all six Avro-spec codecs — bzip2/xz now write AND read
    # JVM-side (write compression moved into the CompressBlock UDF)
    for codec in ("null", "deflate", "snappy", "zstandard", "bzip2", "xz"):
        d = tempfile.mkdtemp(prefix=f"codec_{codec}_")
        t0 = time.monotonic()
        info = write_avro_files(
            big.coalesce(1), sch, d, codec=codec, block_records=4096
        )
        w = time.monotonic() - t0
        size = sum(i["n_bytes"] for i in info)
        times = []
        for _ in range(3):
            t0 = time.monotonic()
            got = read_avro_files_split(
                spark, d, sch, split_bytes=16 << 20, engine="jvm"
            ).count()
            times.append(time.monotonic() - t0)
            assert got == n
        med = statistics.median(times)
        print(
            f"{codec:10s} {size/1e6:8.1f} MB  write {w:6.2f}s  "
            f"split-read median {med:5.2f}s  ({n/med/1e6:.1f} M rows/s)  "
            f"spread [{min(times):.2f}, {max(times):.2f}]"
        )


if __name__ == "__main__":
    main()
