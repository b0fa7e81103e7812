"""profile_table vs hand-computed stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_spark.errors import AvroSparkError
from avro_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "a", 1.5),
        (2, "b", None),
        (3, None, 2.5),
        (4, "b", 2.5),
        (5, "c", -1.0),
    ]
    return spark.createDataFrame(rows, "id long, s string, v double")


def test_profile_exact(df):
    out = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r["n_rows"] == 5 for r in out.values())
    assert out["id"]["n_nulls"] == 0 and out["id"]["n_distinct"] == 5
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 3
    assert out["v"]["n_nulls"] == 1 and out["v"]["n_distinct"] == 3
    assert out["id"]["min_str"] == "1" and out["id"]["max_str"] == "5"
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "c"
    assert out["v"]["min_str"] == "-1.0" and out["v"]["max_str"] == "2.5"
    assert out["id"]["dtype"] == "bigint"


def test_profile_approx_close(df):
    out = {r["column"]: r for r in profile_table(df).collect()}
    # HLL on 5 values is exact in practice
    assert out["s"]["n_distinct"] == 3


def test_profile_subset_and_errors(df):
    assert profile_table(df, columns=["id"]).count() == 1
    with pytest.raises(AvroSparkError, match="no such columns"):
        profile_table(df, columns=["nope"])
    with pytest.raises(AvroSparkError, match="at least one"):
        profile_table(df, columns=[])


def test_profile_single_aggregate_pass(df):
    plan = (
        profile_table(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # approx path must not Expand (the k-fold row multiplication of
    # multi-count-distinct); one scan, partial+final aggregate only
    assert "Expand" not in plan


def test_profile_map_column(spark):
    # maps are unorderable: the profiler must fall back to their JSON
    # rendering instead of crashing min/max (review regression)
    df = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"b": 2}), (3, None)],
        "id long, m map<string,int>",
    )
    from avro_spark.operators.profile import profile_table

    got = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert got["m"]["n_nulls"] == 1
    assert got["m"]["n_distinct"] == 2


def test_profile_quoted_and_dotted_names(spark):
    from pyspark.sql import functions as F

    from avro_spark.operators.profile import profile_table

    df = spark.range(3).select(
        F.col("id").alias("O'Brien"), F.col("id").alias("a.b")
    )
    got = {r["column"]: r for r in profile_table(df, exact_distinct=True).collect()}
    assert got["O'Brien"]["n_distinct"] == 3
    assert got["a.b"]["n_rows"] == 3
