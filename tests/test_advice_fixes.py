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


# ----------------------------------------------------------- round 2 advice


def test_recursive_nullable_union_resolution():
    """A recursive nullable record resolved against a [null, Record]
    union reader must terminate (the de-nulled writer copy is cached per
    node and the in-progress to_union plan memoized, so the cycle
    resolves to the in-progress plan instead of recursing forever)."""
    writer = avro_spark.create(
        {
            "type": "record",
            "name": "Node",
            "fields": [
                {"name": "v", "type": "long"},
                {"name": "children", "type": {"type": "array", "items": "Node*"}},
            ],
        }
    )
    reader = avro_spark.create(
        {
            "type": "record",
            "name": "Node",
            "fields": [
                {"name": "v", "type": "long"},
                {"name": "children", "type": {"type": "array", "items": ["null", "Node"]}},
            ],
        }
    )
    from avro_spark.plans.resolution import resolve_cached

    plan = resolve_cached(writer, reader)
    assert plan.kind == "record"
    # the cyclic plan must also survive expression lowering
    assert avro_spark.compile(writer, reader) is not None
    # and still reject a genuinely incompatible nullable→union pair
    w2 = avro_spark.create(
        {"type": "record", "name": "R", "fields": [{"name": "x", "type": "string*"}]}
    )
    r2 = avro_spark.create(
        {"type": "record", "name": "R", "fields": [{"name": "x", "type": ["null", "long"]}]}
    )
    with pytest.raises(AvroSparkError):
        resolve_cached(w2, r2)


def test_validate_array_from_dict_pairs_semantics():
    """dict→array conversion mirrors Lua pairs() (frontend.lua:883-890):
    every present entry validated at its own numeric key, holes never
    visited, float/0/negative keys legal, non-number keys error with the
    key on the path, empty table = empty array."""
    sch = avro_spark.create({"type": "array", "items": "int"})
    # dense 1..n spelled as a table → plain array
    assert avro_spark.validate(sch, {1: 10, 2: 20}) == [10, 20]
    # sparse table: holes are NOT visited/validated; result stays keyed
    assert avro_spark.validate(sch, {1: 10, 10**9: 20}) == {1: 10, 10**9: 20}
    # 0 / negative / float keys are Lua numbers — copied, not dropped
    assert avro_spark.validate(sch, {0: 5, -3: 7}) == {0: 5, -3: 7}
    assert avro_spark.validate(sch, {1.5: 9}) == {1.5: 9}
    # empty table validates as the empty array (pairs() visits nothing)
    assert avro_spark.validate(sch, {}) == []
    # non-number key: error carries the key on the path
    with pytest.raises(AvroSparkError, match="key: Non-number array key"):
        avro_spark.validate(sch, {"key": 1})
    # values at numeric keys are still validated
    with pytest.raises(AvroSparkError, match="Not a int"):
        avro_spark.validate(sch, {1: "xxx"})


def test_wrap_root_name_collision_one_sided():
    """If only ONE side defines a user type named '_root_', both
    synthetic wrappers must still pick the same escalated name so record
    resolution sees matching root names."""
    writer = avro_spark.create(
        {
            "type": "array",
            "items": {
                "type": "record",
                "name": "_root_",
                "fields": [{"name": "x", "type": "int"}],
            },
        }
    )
    reader = avro_spark.create(
        {
            "type": "array",
            "items": {
                "type": "record",
                "name": "other",
                "fields": [{"name": "x", "type": "int"}],
            },
        }
    )
    # writer's '_root_' forces escalation; reader has no such type — the
    # shared-taken-names fix keeps both wrappers on '_root__'
    cs = avro_spark.compile(writer, writer)
    assert cs is not None
    # cross-compile of compatible-but-differently-named items must fail
    # on the ITEMS, not on a phantom wrapper-name mismatch
    with pytest.raises(AvroSparkError, match="incompatible"):
        avro_spark.compile(writer, reader)


def test_dedup_clusters_string_ids(spark):
    """String/UUID ids keep their native type through dedup_clusters —
    the old cast('long') nulled them all and merged everything."""
    ids = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "_id string")
    pairs = spark.createDataFrame([("a", "b"), ("c", "d")], "id_a string, id_b string")
    out = {r._id: r.cluster_id for r in dedup_clusters(ids, pairs, "_id").collect()}
    assert out == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_dedup_clusters_string_chain(spark):
    """Multi-hop string component converges to the lexicographic min."""
    ids = spark.createDataFrame([(x,) for x in "abcdef"], "_id string")
    pairs = spark.createDataFrame(
        [("f", "e"), ("e", "d"), ("d", "c"), ("c", "b"), ("b", "a")],
        "id_a string, id_b string",
    )
    out = {r._id: r.cluster_id for r in dedup_clusters(ids, pairs, "_id").collect()}
    assert out == {x: "a" for x in "abcdef"}


def test_jsonl_blank_line_whitespace_classes(spark, tmp_path):
    """Tab- and CR-only lines are blank lines: skipped like the native
    JSON source, not parsed as corrupt rows."""
    from avro_spark.sources.jsonl import read_jsonl

    p = tmp_path / "x.jsonl"
    p.write_bytes(b'{"a": 1}\n\t\n  \n\r\n{"a": 2}\n')
    sch = avro_spark.create(
        {"type": "record", "name": "R", "fields": [{"name": "a", "type": "long"}]}
    )
    df = read_jsonl(spark, str(p), schema=sch, avro_conventions=True, mode="FAILFAST")
    assert sorted(r.a for r in df.collect()) == [1, 2]


def test_dedup_clusters_pairs_mention_unknown_ids(spark):
    """Pair endpoints absent from `ids` (x, a here) still participate in
    propagation and converge to the full component min — the change
    probe must keep iterating through multi-hop chains that run through
    edge-only nodes."""
    ids = spark.createDataFrame([("b",)], "_id string")
    pairs = spark.createDataFrame(
        [("b", "x"), ("x", "a")], "id_a string, id_b string"
    )
    out = {r._id: r.cluster_id for r in dedup_clusters(ids, pairs, "_id").collect()}
    # all three nodes reachable; the component min is 'a'
    assert out == {"a": "a", "b": "a", "x": "a"}


def test_conform_json_versioning_with_distinct_schema_object(spark):
    """Round-3 advisor (low): conform_json keyed the '(schema versioning)'
    renderings by id() of the resolution plan's writer nodes, so an
    equal-but-distinct Schema argument made them silently never fire.
    The validator now re-anchors on the plan's writer tree."""
    from avro_spark.operators.conform import ERRORS_COL, conform_json

    w = {"type": "record", "name": "R",
         "fields": [{"name": "u", "type": ["null", "int", "double"]}]}
    r = {"type": "record", "name": "R",
         "fields": [{"name": "u", "type": ["null", "string", "int"]}]}
    c = avro_spark.compile(avro_spark.create(w), avro_spark.create(r))
    # a DISTINCT (re-parsed) but structurally equal writer schema
    sch2 = avro_spark.create(w)
    jdf = spark.createDataFrame([('{"u": {"double": 4.5}}',)], "j string")
    errs = conform_json(
        jdf, "j", sch2, mode="flag", resolution=c.plan
    ).collect()[0][ERRORS_COL]
    assert errs == ['u: Unknown key: "double" (schema versioning)'], errs


def test_conform_json_foreign_schema_with_resolution_raises(spark):
    """A schema that occurs nowhere in the resolution plan's writer tree
    is a caller bug — loud error, not silently-inert versioning."""
    from avro_spark.errors import CompileError
    from avro_spark.operators.conform import conform_json

    w = {"type": "record", "name": "R",
         "fields": [{"name": "u", "type": ["null", "int", "double"]}]}
    r = {"type": "record", "name": "R",
         "fields": [{"name": "u", "type": ["null", "string", "int"]}]}
    c = avro_spark.compile(avro_spark.create(w), avro_spark.create(r))
    other = avro_spark.create(
        {"type": "record", "name": "Z",
         "fields": [{"name": "x", "type": "long"}]})
    jdf = spark.createDataFrame([('{"x": 1}',)], "j string")
    with pytest.raises(CompileError, match="resolution plan"):
        conform_json(jdf, "j", other, mode="flag", resolution=c.plan)


def test_conform_json_foreign_schema_raises_even_without_unmapped(spark):
    """The loud foreign-schema error must not depend on whether the plan
    happens to have unmapped union branches."""
    from avro_spark.errors import CompileError
    from avro_spark.operators.conform import conform_json

    w = {"type": "record", "name": "R",
         "fields": [{"name": "u", "type": ["null", "int"]}]}
    r = {"type": "record", "name": "R",
         "fields": [{"name": "u", "type": ["null", "int", "string"]}]}
    c = avro_spark.compile(avro_spark.create(w), avro_spark.create(r))
    other = avro_spark.create(
        {"type": "record", "name": "Z",
         "fields": [{"name": "x", "type": "long"}]})
    jdf = spark.createDataFrame([('{"x": 1}',)], "j string")
    with pytest.raises(CompileError, match="resolution plan"):
        conform_json(jdf, "j", other, mode="flag", resolution=c.plan)


def test_conform_json_ambiguous_equal_subtrees_raise(spark):
    """Two structurally-equal writer subtrees whose reader resolutions
    DIFFER cannot be anchored by structure alone — loud error instead of
    silently picking the first (which would skip versioning errors for
    the other field's data)."""
    from avro_spark.errors import CompileError
    from avro_spark.operators.conform import conform_json

    w = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": ["null", "int", "double"]},
        {"name": "b", "type": ["null", "int", "double"]}]}
    r = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": ["null", "int", "double"]},
        {"name": "b", "type": ["null", "int"]}]}   # drops double from b only
    c = avro_spark.compile(avro_spark.create(w), avro_spark.create(r))
    # re-parsed union equal to BOTH field subtrees
    sub = avro_spark.create(
        {"type": "record", "name": "W",
         "fields": [{"name": "u", "type": ["null", "int", "double"]}]}
    ).root.fields[0].type
    from types import SimpleNamespace
    jdf = spark.createDataFrame([('{"double": 1.5}',)], "j string")
    with pytest.raises(CompileError, match="several writer subtrees"):
        conform_json(jdf, "j", SimpleNamespace(root=sub), mode="flag",
                     resolution=c.plan)


def test_conform_json_unambiguous_equal_subtrees_anchor(spark):
    """Equal subtrees with IDENTICAL resolutions are safe to anchor —
    no false ambiguity error."""
    from types import SimpleNamespace

    from avro_spark.operators.conform import ERRORS_COL, conform_json

    w = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": ["null", "int", "double"]},
        {"name": "b", "type": ["null", "int", "double"]}]}
    r = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": ["null", "int"]},
        {"name": "b", "type": ["null", "int"]}]}   # drops double from BOTH
    c = avro_spark.compile(avro_spark.create(w), avro_spark.create(r))
    sub = avro_spark.create(
        {"type": "record", "name": "W",
         "fields": [{"name": "u", "type": ["null", "int", "double"]}]}
    ).root.fields[0].type
    jdf = spark.createDataFrame([('{"double": 1.5}',)], "j string")
    errs = conform_json(jdf, "j", SimpleNamespace(root=sub), mode="flag",
                        resolution=c.plan).collect()[0][ERRORS_COL]
    assert errs == ['Unknown key: "double" (schema versioning)'], errs


def test_build_budget_is_thread_local():
    """A reduced branching-recursion budget opened on one driver thread
    must not leak into a concurrent plan build on another thread (the old
    module-level _BUILD_STATE slot did exactly that)."""
    import threading
    from types import SimpleNamespace

    from avro_spark.plans import flatten as FL

    branching = avro_spark.create({
        "type": "record", "name": "Node", "fields": [
            {"name": "a", "type": ["null", "Node"]},
            {"name": "b", "type": ["null", "Node"]},
        ],
    }).root
    plan = SimpleNamespace(writer=branching, reader=branching)
    reduced = FL._open_budget(plan)
    assert reduced < FL.MAX_UNROLL  # multiplicity-2 recursion reduces it

    opened = threading.Event()
    release = threading.Event()
    seen_other_thread: list = []

    def holder():
        with FL._build_scope(plan):
            assert FL._unroll_budget() == reduced
            opened.set()
            release.wait(10)

    def observer():
        opened.wait(10)
        seen_other_thread.append(FL._unroll_budget())
        release.set()

    t1 = threading.Thread(target=holder)
    t2 = threading.Thread(target=observer)
    t1.start(); t2.start()
    t1.join(10); t2.join(10)
    # the observer thread must see the DEFAULT budget, not the holder's
    assert seen_other_thread == [FL.MAX_UNROLL]
    # and after the scope closes this thread is back to the default too
    assert FL._unroll_budget() == FL.MAX_UNROLL


def test_unroll_guard_message_names_the_binding_limit(spark):
    """Under branching recursion the raise_error message must name the
    REDUCED budget + UNROLL_WIDTH_TARGET, not advise raising MAX_UNROLL
    (which would not help there)."""
    from types import SimpleNamespace

    from pyspark.sql import types as T

    from avro_spark.plans import flatten as FL

    branching = avro_spark.create({
        "type": "record", "name": "Node2", "fields": [
            {"name": "a", "type": ["null", "Node2"]},
            {"name": "b", "type": ["null", "Node2"]},
        ],
    }).root
    plan = SimpleNamespace(writer=branching, reader=branching)
    with FL._build_scope(plan):
        from pyspark.sql import functions as F

        col = FL._unroll_guard(F.lit("x"), T.StringType())
        rendered = str(col)
        assert "UNROLL_WIDTH_TARGET" in rendered
        assert f"effective unroll budget {FL._open_budget(plan)}" in rendered
    # outside any scope the plain MAX_UNROLL wording comes back
    col = FL._unroll_guard(__import__("pyspark.sql.functions", fromlist=["lit"]).lit("x"), T.StringType())
    assert "MAX_UNROLL=8" in str(col)
