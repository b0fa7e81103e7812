"""Scale-utility tests: bucketed co-located joins plan without a shuffle,
salted joins return exactly the plain-join rows, skew report shares sum
sensibly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_spark.operators.scale import (
    bucketed_join,
    key_skew_report,
    salted_join,
    write_bucketed,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return tmp_path_factory.mktemp("warehouse")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8,
                   path=str(warehouse / "orders_b"))
    write_bucketed(lineitem, "t_lineitem_b", "o_orderkey", 8,
                   path=str(warehouse / "lineitem_b"))
    try:
        # force the sort-merge path so the bucket metadata is what must
        # eliminate the exchanges (broadcast would mask it)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        # and it is still correct
        expect = (
            spark.read.parquet(f"{SF_DIR}/orders.parquet")
            .join(
                spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_salted_join_matches_plain_join(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet").select(
        "n_nationkey", "n_name"
    ).withColumnRenamed("n_nationkey", "c_nationkey")
    plain = cust.join(nation, "c_nationkey").select("c_custkey", "n_name")
    salted = salted_join(cust, nation, "c_nationkey", salt=4).select(
        "c_custkey", "n_name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    right = spark.createDataFrame([(1, "X")], "k int, w string")
    got = sorted(map(tuple, salted_join(left, right, "k", salt=3, how="left").collect()))
    assert got == [(1, "a", "X"), (2, "b", None)]


def test_salted_join_rejects_right(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "id", how="right")


def test_key_skew_report(spark):
    df = spark.createDataFrame(
        [(1,)] * 8 + [(2,)] * 2, "k int"
    )
    rows = key_skew_report(df, "k").collect()
    assert [(r["k"], r["n_rows"]) for r in rows] == [(1, 8), (2, 2)]
    assert abs(rows[0]["share"] - 0.8) < 1e-9


# ------------------------------------------------------- global id assignment
def test_assign_global_ids_matches_global_row_number(spark):
    from avro_spark.operators.scale import assign_global_ids

    rows = [(i, f"v{i % 7}") for i in range(997)]
    import random

    rnd = random.Random(3)
    rnd.shuffle(rows)
    df = spark.createDataFrame(rows, "key long, payload string").repartition(7)
    out = assign_global_ids(df, "key", num_partitions=5)
    got = {r["key"]: r["_gid"] for r in out.collect()}
    # unique keys → ids must equal the key's global sort position
    assert got == {k: k for k, _p in rows}
    assert out.columns == ["key", "payload", "_gid"]


def test_assign_global_ids_dense_and_deterministic_with_ties(spark):
    from avro_spark.operators.scale import assign_global_ids

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (0, "z")], "key long, payload string"
    )
    out1 = {(r["key"], r["payload"]): r["_gid"]
            for r in assign_global_ids(df, "key", num_partitions=3).collect()}
    out2 = {(r["key"], r["payload"]): r["_gid"]
            for r in assign_global_ids(df.repartition(2), "key", num_partitions=3).collect()}
    assert sorted(out1.values()) == [0, 1, 2, 3]  # dense from 0
    assert out1[(0, "z")] == 0                    # order respected
    assert out1 == out2                           # physical layout irrelevant


def test_assign_global_ids_no_single_partition_window(spark):
    from avro_spark.operators.scale import assign_global_ids

    df = spark.range(1000).withColumnRenamed("id", "key")
    plan = (
        assign_global_ids(df, "key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the failure mode this operator exists to avoid
    assert "Exchange SinglePartition" not in plan


class TestOutputSizing:
    def test_estimate_row_bytes_positive_and_sane(self, spark):
        from avro_spark.operators.scale import estimate_row_bytes

        df = spark.createDataFrame(
            [(i, "x" * 100) for i in range(1000)], "id long, payload string"
        )
        bpr = estimate_row_bytes(df, sample_rows=500)
        # parquet-compressed constant strings: well under raw 108 B/row,
        # but never zero
        assert 0 < bpr < 1000

    def test_repartition_for_output_hits_target_count(self, spark):
        from avro_spark.operators.scale import repartition_for_output

        df = spark.createDataFrame(
            [(i,) for i in range(10_000)], "id long"
        )
        # known geometry: 10k rows x 100 B = 1 MB -> 4 files of 256 KB
        out = repartition_for_output(
            df, target_bytes=256 << 10, n_rows=10_000, bytes_per_row=100.0
        )
        assert out.rdd.getNumPartitions() == 4

    def test_repartition_for_output_empty_df(self, spark):
        from avro_spark.operators.scale import repartition_for_output

        df = spark.createDataFrame([], "id long")
        out = repartition_for_output(df, n_rows=0, bytes_per_row=0.0)
        assert out.rdd.getNumPartitions() == 1

    def test_repartition_by_range_clusters(self, spark):
        from avro_spark.operators.scale import repartition_for_output

        df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
        out = repartition_for_output(
            df, target_bytes=100, n_rows=1000, bytes_per_row=1.0, by="id"
        )
        assert out.rdd.getNumPartitions() == 10
        # range partitioning: each partition holds a contiguous id range
        parts = out.withColumn(
            "p", F.spark_partition_id()
        ).groupBy("p").agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        rows = sorted(map(tuple, parts.collect()))
        spans = sorted((lo, hi) for _, lo, hi in rows)
        for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
            assert h1 < l2  # disjoint, ordered ranges
