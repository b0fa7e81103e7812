"""Incremental snapshot merge (operators/merge.py): latest-wins CDC
upsert/delete semantics, batch dedup, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from avro_spark.errors import AvroSparkError
from avro_spark.operators.merge import latest_changes, merge_snapshot


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, name string, score long",
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "id long, name string, score long, op string, version long"
    )


def test_upsert_existing_and_new(spark, base):
    ch = _changes(
        spark,
        [(2, "B", 21, "upsert", 1), (4, "d", 40, "upsert", 1)],
    )
    got = sorted(map(tuple, merge_snapshot(base, ch, "id").collect()))
    assert got == [(1, "a", 10), (2, "B", 21), (3, "c", 30), (4, "d", 40)]


def test_delete(spark, base):
    ch = _changes(spark, [(1, None, None, "delete", 1)])
    got = sorted(map(tuple, merge_snapshot(base, ch, "id").collect()))
    assert got == [(2, "b", 20), (3, "c", 30)]


def test_delete_absent_key_is_noop(spark, base):
    ch = _changes(spark, [(99, None, None, "delete", 1)])
    got = sorted(map(tuple, merge_snapshot(base, ch, "id").collect()))
    assert got == sorted(map(tuple, base.collect()))


def test_latest_version_wins_within_batch(spark, base):
    ch = _changes(
        spark,
        [
            (2, "old", 0, "upsert", 1),
            (2, "new", 99, "upsert", 5),
            (2, "mid", 50, "upsert", 3),
        ],
    )
    got = {r["id"]: (r["name"], r["score"]) for r in merge_snapshot(base, ch, "id").collect()}
    assert got[2] == ("new", 99)


def test_delete_beats_upsert_at_equal_version(spark, base):
    ch = _changes(
        spark,
        [(3, "zz", 1, "upsert", 7), (3, None, None, "delete", 7)],
    )
    got = sorted(r["id"] for r in merge_snapshot(base, ch, "id").collect())
    assert got == [1, 2]


def test_delete_then_higher_version_reinsert(spark, base):
    ch = _changes(
        spark,
        [(3, None, None, "delete", 1), (3, "c2", 31, "upsert", 2)],
    )
    got = {r["id"]: r["name"] for r in merge_snapshot(base, ch, "id").collect()}
    assert got[3] == "c2"


def test_missing_columns_raise(spark, base):
    ch = spark.createDataFrame([(1, "x", "upsert", 1)], "id long, name string, op string, version long")
    with pytest.raises(AvroSparkError, match="missing base columns"):
        merge_snapshot(base, ch, "id")


def test_missing_op_column_raises(spark, base):
    ch = spark.createDataFrame(
        [(1, "x", 5)], "id long, name string, score long"
    )
    with pytest.raises(AvroSparkError, match="needs 'op'"):
        merge_snapshot(base, ch, "id")


def test_latest_changes_one_row_per_key(spark):
    ch = _changes(
        spark,
        [
            (1, "a", 1, "upsert", 1),
            (1, "b", 2, "upsert", 2),
            (2, "c", 3, "delete", 1),
        ],
    )
    got = latest_changes(ch, "id").collect()
    assert len(got) == 2


def test_broadcast_changes_plan(spark, base):
    ch = _changes(spark, [(2, "B", 21, "upsert", 1)])
    plan = (
        merge_snapshot(base, ch, "id", broadcast_changes=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_merge_idempotent_reapply(spark, base):
    ch = _changes(
        spark,
        [(2, "B", 21, "upsert", 1), (1, None, None, "delete", 1)],
    )
    once = merge_snapshot(base, ch, "id")
    twice = merge_snapshot(once, ch, "id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_unknown_op_raises_not_deletes(spark, base):
    import pyspark

    ch = _changes(spark, [(2, "B", 21, "UPSERT", 1)])  # wrong case
    with pytest.raises(Exception, match="bad op value"):
        merge_snapshot(base, ch, "id").collect()


def test_equal_version_upsert_tie_is_deterministic(spark, base):
    ch = _changes(
        spark,
        [(2, "aaa", 1, "upsert", 5), (2, "bbb", 2, "upsert", 5)],
    )
    winners = [
        merge_snapshot(base, ch, "id").where("id = 2").collect()[0]["name"]
        for _ in range(3)
    ]
    assert len(set(winners)) == 1  # same winner every run
