"""Regression tests for the round-1 advisor findings (ADVICE.md):
overflow-safe CC convergence, NaN-vs-null codec scope, union error
shapes, and integer-nanos sessionize input.
"""

from __future__ import annotations

import pytest

import avro_spark
from avro_spark.errors import AvroSparkError
from avro_spark.functions.dedup import dedup_clusters
from avro_spark.operators.events import sessionize_batch
from avro_spark.sources.avro_binary import decode_record, encode_record


def test_dedup_clusters_huge_hash_ids(spark):
    """63-bit hash-scale ids: the old bigint Σlbl convergence check would
    overflow under ANSI; the decimal(38,0) sum must not."""
    big = 2**62
    ids = spark.createDataFrame(
        [(big,), (big + 1,), (big + 2,), (big + 3,)], "_id long"
    )
    pairs = spark.createDataFrame(
        [(big, big + 1), (big + 2, big + 3)], "id_a long, id_b long"
    )
    out = {
        r._id: r.cluster_id for r in dedup_clusters(ids, pairs, "_id").collect()
    }
    assert out == {big: big, big + 1: big, big + 2: big + 2, big + 3: big + 2}


def test_nan_null_scope_numeric_vs_string():
    """NaN means null only for numeric branches; nullable double null and
    NaN both encode to the null branch (documented ambiguity)."""
    sch = avro_spark.create(
        {
            "type": "record",
            "name": "N",
            "fields": [
                {"name": "d", "type": ["null", "double"]},
                {"name": "s", "type": ["null", "string"]},
            ],
        }
    )
    assert decode_record(sch, encode_record(sch, {"d": None, "s": None})) == {
        "d": None, "s": None,
    }
    nan = float("nan")
    assert decode_record(sch, encode_record(sch, {"d": nan, "s": "x"})) == {
        "d": None, "s": "x",
    }
    # a NaN float in a STRING branch is malformed input, not null
    with pytest.raises(Exception):
        encode_record(sch, {"d": 1.0, "s": nan})


def test_general_union_bad_value_raises_avro_error():
    sch = avro_spark.create(
        {
            "type": "record",
            "name": "U",
            "fields": [{"name": "u", "type": ["int", "string"]}],
        }
    )
    # multi-entry dict without $type$: not a valid tag form
    with pytest.raises(AvroSparkError, match="bad union value"):
        encode_record(sch, {"u": {"int": 1, "string": "x"}})
    with pytest.raises(AvroSparkError, match="bad union tag"):
        encode_record(sch, {"u": {"double": 1.0}})


def test_simple_union_record_branch_tag_ambiguity():
    """A single-field record branch whose field name equals the branch tag
    must NOT be tag-unwrapped — the plain record form wins."""
    sch = avro_spark.create(
        {
            "type": "record",
            "name": "A",
            "fields": [
                {
                    "name": "r",
                    "type": [
                        "null",
                        # branch tag for a record branch is its name "Inner"
                        {
                            "type": "record",
                            "name": "Inner",
                            "fields": [{"name": "Inner", "type": "int"}],
                        },
                    ],
                }
            ],
        }
    )
    rec = {"r": {"Inner": 7}}  # record form: field Inner = 7
    assert decode_record(sch, encode_record(sch, rec)) == {"r": {"Inner": 7}}


def test_sessionize_batch_bigint_nanos(spark):
    """Integer (nanos) ts input must produce the same sessions as the
    equivalent timestamp input — not nanos-interpreted-as-seconds."""
    base_us = 1_700_000_000_000_000  # microseconds
    rows_ns = [
        (1, (base_us + 0) * 1000),
        (1, (base_us + 60_000_000) * 1000),          # +1 min: same session
        (1, (base_us + 4_000_000_000) * 1000),       # +>30 min gap: new session
    ]
    from pyspark.sql import functions as F

    df_ns = spark.createDataFrame(rows_ns, "user_id int, ts long")
    df_ts = df_ns.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
    out_ns = sorted(
        (r.user_id, r.session_id, r.n_events)
        for r in sessionize_batch(df_ns, "user_id", "ts", 1800).collect()
    )
    out_ts = sorted(
        (r.user_id, r.session_id, r.n_events)
        for r in sessionize_batch(df_ts, "user_id", "ts", 1800).collect()
    )
    assert out_ns == out_ts == [(1, 0, 2), (1, 1, 1)]
