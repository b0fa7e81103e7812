"""Temporal operators: as-of join, bucketed range join, time rollup.

Each operator is checked value-for-value against a naive in-driver
reference computation on small deterministic data, plus plan-shape
guards (no BroadcastNestedLoopJoin, single Exchange for as-of).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from avro_spark.errors import AvroSparkError
from avro_spark.operators.temporal import asof_join, range_join, time_rollup

T0 = dt.datetime(2024, 1, 1)


def ts(mins):
    return T0 + dt.timedelta(minutes=mins)


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, ts(0), 10.0),
        (1, ts(5), 11.0),
        (1, ts(20), 12.0),
        (2, ts(3), 20.0),
        (3, ts(7), 30.0),  # key with no quotes
    ]
    return spark.createDataFrame(rows, "key long, ts timestamp, price double")


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        (1, ts(0), 100.0),   # equal-ts tie with first trade
        (1, ts(4), 104.0),
        (1, ts(6), 106.0),
        (2, ts(1), 201.0),
        (2, ts(9), 209.0),   # after key-2's only trade
    ]
    return spark.createDataFrame(rows, "key long, ts timestamp, bid double")


def naive_asof(trades, quotes, direction="backward"):
    out = {}
    for k, t, _p in trades:
        cands = [
            (qt, b)
            for (qk, qt, b) in quotes
            if qk == k and (qt <= t if direction == "backward" else qt >= t)
        ]
        if cands:
            best = (max if direction == "backward" else min)(cands)
            out[(k, t)] = best
        else:
            out[(k, t)] = (None, None)
    return out


TRADES = [(1, ts(0), 10.0), (1, ts(5), 11.0), (1, ts(20), 12.0),
          (2, ts(3), 20.0), (3, ts(7), 30.0)]
QUOTES = [(1, ts(0), 100.0), (1, ts(4), 104.0), (1, ts(6), 106.0),
          (2, ts(1), 201.0), (2, ts(9), 209.0)]


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_naive(trades, quotes, direction):
    got = {
        (r["key"], r["ts"]): (r["ts_r"], r["bid_r"])
        for r in asof_join(
            trades, quotes, on="key", direction=direction
        ).collect()
    }
    assert got == naive_asof(TRADES, QUOTES, direction)


def test_asof_equal_ts_is_inclusive(trades, quotes):
    out = {
        r["ts"]: r["bid_r"]
        for r in asof_join(trades, quotes, on="key").where("key = 1").collect()
    }
    assert out[ts(0)] == 100.0  # quote at exactly the trade instant


def test_asof_tolerance_nulls_stale_matches(trades, quotes):
    out = {
        (r["key"], r["ts"]): r["bid_r"]
        for r in asof_join(
            trades, quotes, on="key", tolerance_seconds=120
        ).collect()
    }
    # trade at t=5 matched quote at t=4 (60s, in tolerance)
    assert out[(1, ts(5))] == 104.0
    # trade at t=20 matched quote at t=6 (840s, out of tolerance) → null
    assert out[(1, ts(20))] is None
    # unmatched key stays null
    assert out[(3, ts(7))] is None


def test_asof_preserves_left_rows_and_payload(trades, quotes):
    out = asof_join(trades, quotes, on="key")
    assert out.count() == trades.count()
    assert {r["price"] for r in out.collect()} == {10.0, 11.0, 12.0, 20.0, 30.0}


def test_asof_single_exchange(trades, quotes):
    plan = asof_join(trades, quotes, on="key")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_bad_direction(trades, quotes):
    with pytest.raises(AvroSparkError):
        asof_join(trades, quotes, on="key", direction="nearest")


# ---------------------------------------------------------------- range join
@pytest.fixture(scope="module")
def intervals(spark):
    rows = [
        (1, ts(0), ts(10), "a"),
        (1, ts(30), ts(40), "b"),
        (2, ts(0), ts(5), "c"),
        # long interval spanning many buckets
        (3, ts(0), ts(600), "d"),
    ]
    return spark.createDataFrame(
        rows, "key long, start timestamp, end timestamp, tag string"
    )


def test_range_join_matches_naive(spark, trades, intervals):
    got = sorted(
        (r["key"], r["ts"], r["tag"])
        for r in range_join(
            trades, intervals, on="key", bucket_seconds=120
        ).collect()
    )
    ivals = [(1, ts(0), ts(10), "a"), (1, ts(30), ts(40), "b"),
             (2, ts(0), ts(5), "c"), (3, ts(0), ts(600), "d")]
    want = sorted(
        (k, t, tag)
        for (k, t, _p) in TRADES
        for (ik, s, e, tag) in ivals
        if ik == k and s <= t < e
    )
    assert got == want


def test_range_join_no_duplicate_matches(spark, trades, intervals):
    # interval d spans 300 buckets at 120s — each contained row must
    # still appear exactly once
    out = range_join(trades, intervals, on="key", bucket_seconds=120)
    rows = [(r["key"], r["ts"], r["tag"]) for r in out.collect()]
    assert len(rows) == len(set(rows))


def test_range_join_end_inclusive(spark, intervals):
    probe = intervals.sparkSession.createDataFrame(
        [(2, ts(5), 0.0)], "key long, ts timestamp, price double"
    )
    exc = range_join(probe, intervals, on="key", bucket_seconds=60)
    inc = range_join(
        probe, intervals, on="key", bucket_seconds=60, end_inclusive=True
    )
    assert exc.count() == 0 and inc.count() == 1


def test_range_join_plan_is_equi_join(trades, intervals):
    plan = range_join(
        trades, intervals, on="key", bucket_seconds=120
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- rollup
def test_time_rollup_matches_per_granularity_aggs(spark):
    rows = [(i, ts(i * 37), float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, ts timestamp, value double")
    out = time_rollup(
        df, "ts", granularities=("hour", "day"), aggs={"value": "sum"}
    )
    got_h = {
        (r["bucket"], r["sum_value"], r["n_rows"])
        for r in out.where("granularity = 'hour'").collect()
    }
    want_h = {
        (r["bucket"], r["sum_value"], r["n_rows"])
        for r in df.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.sum("value").alias("sum_value"), F.count("*").alias("n_rows"))
        .collect()
    }
    assert got_h == want_h
    got_d = {
        (r["bucket"], r["sum_value"])
        for r in out.where("granularity = 'day'").collect()
    }
    want_d = {
        (r["bucket"], r["sum_value"])
        for r in df.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.sum("value").alias("sum_value"))
        .collect()
    }
    assert got_d == want_d


def test_time_rollup_group_cols(spark):
    rows = [(i % 3, ts(i * 61), 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, "dom long, ts timestamp, value double")
    out = time_rollup(
        df, "ts", granularities=("day",), group_cols=("dom",),
        aggs={"value": "sum"},
    )
    total = out.agg(F.sum("n_rows")).collect()[0][0]
    assert total == 50
    assert out.select("dom").distinct().count() == 3


def test_time_rollup_bad_granularity(spark):
    df = spark.createDataFrame([(ts(0),)], "ts timestamp")
    with pytest.raises(AvroSparkError):
        time_rollup(df, "ts", granularities=("fortnight",))


def test_nanos_long_ts_accepted(spark):
    # bigint nanos ts (the testdata's nanosAsLong shape) normalizes via
    # integer div — same guard as sessionize/streaming
    nanos = int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1e9)
    left = spark.createDataFrame(
        [(1, nanos + 300_000_000_000, 1.0)], "key long, ts long, price double"
    )
    right = spark.createDataFrame(
        [(1, nanos, 9.0)], "key long, ts long, bid double"
    )
    out = asof_join(left, right, on="key").collect()
    assert out[0]["bid_r"] == 9.0


# ------------------------------------------------------------ moving_stats
def test_moving_stats_rows_frame(spark):
    rows = [(1, ts(i * 60), float(i)) for i in range(5)] + [
        (2, ts(i * 60), float(10 * i)) for i in range(3)
    ]
    df = spark.createDataFrame(rows, "key long, ts timestamp, value double")
    from avro_spark.operators.temporal import moving_stats

    got = {
        (r["key"], r["ts"]): r
        for r in moving_stats(df, "key", n=3).collect()
    }
    # key 1, row i=3: frame = values 1,2,3
    r = got[(1, ts(180))]
    assert r["prev_value"] == 2.0 and r["delta"] == 1.0
    assert r["mov_sum"] == 6.0 and r["mov_n"] == 3
    # first row per key: no lag, frame = itself
    r0 = got[(2, ts(0))]
    assert r0["prev_value"] is None and r0["mov_n"] == 1


def test_moving_stats_range_frame(spark):
    # ts() is minutes: rows at t=0, 50, 130 min; a 3600-second trailing
    # range at t=130 covers only itself (t=50 is 80 min earlier); at
    # t=50 it covers t=0 and t=50
    rows = [(1, ts(0), 1.0), (1, ts(50), 2.0), (1, ts(130), 4.0)]
    df = spark.createDataFrame(rows, "key long, ts timestamp, value double")
    from avro_spark.operators.temporal import moving_stats

    got = {r["ts"]: r for r in moving_stats(df, "key", range_seconds=3600).collect()}
    assert got[ts(50)]["mov_n"] == 2 and got[ts(50)]["mov_sum"] == 3.0
    assert got[ts(130)]["mov_n"] == 1 and got[ts(130)]["mov_sum"] == 4.0


def test_moving_stats_matches_duckdb(spark):
    import duckdb

    from avro_spark.operators.temporal import moving_stats
    from conftest import SF_DIR

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "value"
    )
    got = {
        r["event_id"]: (r["prev_value"], round(r["mov_avg"], 6), r["mov_n"])
        for r in moving_stats(
            ev, "user_id", n=3, order_cols=("event_id",)
        ).collect()
    }
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT event_id, prev_value, round(mov_avg, 6), mov_n FROM (
          SELECT event_id,
                 lag(value) OVER w AS prev_value,
                 avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS mov_avg,
                 count(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   AS mov_n
          FROM read_parquet('{SF_DIR}/events.parquet')
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        """
    ).fetchall()
    assert len(want) == len(got)
    for eid, prev, avg, n in want:
        assert got[eid] == (prev, avg, n)


def test_moving_stats_bad_n(spark):
    from avro_spark.operators.temporal import moving_stats

    df = spark.createDataFrame([(1, ts(0), 1.0)], "key long, ts timestamp, value double")
    with pytest.raises(AvroSparkError):
        moving_stats(df, "key", n=0)


# ------------------------------------------------- review-fix regressions
def test_asof_null_right_ts_never_matches(spark):
    from avro_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, ts(10))], "key long, ts timestamp")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, ts(720), 7.0)],
        "key long, ts timestamp, price double",
    )
    out = asof_join(left, right, on="key").collect()
    # the NULL-ts dirty row must not be carried; 12:00 is in the future
    assert out[0]["price_r"] is None


def test_asof_right_cols_typo_raises(spark):
    from avro_spark.errors import AvroSparkError
    from avro_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, ts(0))], "key long, ts timestamp")
    right = spark.createDataFrame([(1, ts(0), 1.0)], "key long, ts timestamp, bid double")
    with pytest.raises(AvroSparkError, match="no such column"):
        asof_join(left, right, on="key", right_cols=["typo"])


def test_asof_right_cols_including_ts_ok(spark):
    from avro_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, ts(10))], "key long, ts timestamp")
    right = spark.createDataFrame([(1, ts(5), 1.0)], "key long, ts timestamp, bid double")
    out = asof_join(left, right, on="key", right_cols=["bid", "ts"]).collect()
    assert out[0]["bid_r"] == 1.0 and out[0]["ts_r"] == ts(5)


def test_range_join_right_ts_collision(spark):
    from avro_spark.operators.temporal import range_join

    left = spark.createDataFrame([(1, ts(5))], "key long, ts timestamp")
    right = spark.createDataFrame(
        [(1, ts(99), ts(0), ts(10))],
        "key long, ts timestamp, start timestamp, end timestamp",
    )
    out = range_join(left, right, on="key").collect()
    assert len(out) == 1
    assert out[0]["ts"] == ts(5) and out[0]["ts_r"] == ts(99)


def test_time_rollup_bad_fn_raises(spark):
    from avro_spark.operators.temporal import time_rollup

    df = spark.createDataFrame([(ts(0), 1.0)], "ts timestamp, v double")
    with pytest.raises(AvroSparkError, match="bad aggregate function"):
        time_rollup(df, "ts", aggs={"v": "bogus; drop"})


def test_time_rollup_space_in_column_name(spark):
    from avro_spark.operators.temporal import time_rollup

    df = spark.createDataFrame([(ts(0), 1.0), (ts(1), 2.0)], "ts timestamp, `my value` double")
    out = time_rollup(df, "ts", granularities=("day",), aggs={"my value": "sum"})
    assert out.collect()[0]["sum_my value"] == 3.0


def test_time_rollup_no_view_leak(spark):
    from avro_spark.operators.temporal import time_rollup

    before = {t.name for t in spark.catalog.listTables()}
    df = spark.createDataFrame([(ts(0), 1.0)], "ts timestamp, v double")
    time_rollup(df, "ts", aggs={"v": "sum"}).collect()
    after = {t.name for t in spark.catalog.listTables()}
    assert after == before
