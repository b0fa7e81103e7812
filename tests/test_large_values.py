"""Large-value stress: the Spark analogue of the reference's
buf_grow_test.lua (t/v output-buffer reallocation under values far larger
than any initial capacity). Tungsten manages buffers for us; what must be
shown is that the same *workload shape* — long arrays, megabyte strings,
wide batches of them — flows through flatten/unflatten and the Avro byte
codec without truncation or corruption.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import avro_spark
from avro_spark.sources.avro_binary import (
    decode_record,
    encode_record,
    from_avro_bytes,
    to_avro_bytes,
)

# buf_grow_test.lua's FooBar record: three longs + a long array, streamed
# as an array of records; here one DataFrame row per record
FOOBAR = {
    "type": "record",
    "name": "FooBar",
    "fields": [
        {"name": "A", "type": "long"},
        {"name": "B", "type": "long"},
        {"name": "C", "type": "long"},
        {"name": "D", "type": {"type": "array", "items": "long"}},
    ],
}

BIGSTR = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "body", "type": "string"},
        {"name": "blob", "type": "bytes"},
    ],
}


def test_long_arrays_roundtrip(spark):
    rows = [(i, i * 2, i * 3, list(range(i * 1000))) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "A long, B long, C long, D array<long>")
    cs = avro_spark.compile(avro_spark.create(FOOBAR))
    back = cs.unflatten(cs.flatten(df)).orderBy("A").collect()
    assert [len(r["D"]) for r in back] == [i * 1000 for i in range(1, 9)]
    assert back[7]["D"][:3] == [0, 1, 2] and back[7]["D"][-1] == 7999


def test_long_arrays_avro_codec(spark):
    sch = avro_spark.create(FOOBAR)
    rec = {"A": 1, "B": 2, "C": 3, "D": list(range(200_000))}
    blob = encode_record(sch, rec)
    assert len(blob) > 200_000  # varints, ≥1 byte each
    assert decode_record(sch, blob) == rec


def test_megabyte_strings_through_spark_codec(spark):
    sch = avro_spark.create(BIGSTR)
    rows = [(i, "x" * (1 << 20) + str(i), bytes([i]) * (1 << 19)) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, body string, blob binary")
    out = from_avro_bytes(to_avro_bytes(df, sch, "b"), "b", sch)
    got = {r["id"]: r for r in out.collect()}
    assert len(got) == 4
    for i in range(4):
        assert len(got[i]["body"]) == (1 << 20) + len(str(i))
        assert got[i]["body"].endswith(str(i))
        assert bytes(got[i]["blob"]) == bytes([i]) * (1 << 19)


def test_deeply_wide_flatten(spark):
    """128-field record (past the reference's 15-field function-outlining
    threshold, compiler.lua:406-445) flattens and unflattens intact."""
    n = 128
    schema = {
        "type": "record",
        "name": "Wide",
        "fields": [{"name": f"f{i}", "type": "long"} for i in range(n)],
    }
    df = spark.createDataFrame(
        [tuple(range(n))], ", ".join(f"f{i} long" for i in range(n))
    )
    cs = avro_spark.compile(avro_spark.create(schema))
    flat = cs.flatten(df)
    assert len(flat.columns) == n
    row = cs.unflatten(flat).collect()[0]
    assert [row[f"f{i}"] for i in range(n)] == list(range(n))
