"""Driver-gate contract guards.

Round 1 lost 7 CORRECTNESS rows not to wrong answers but to output
*shape*: the driver's pandas canonicalizer ``sort_values`` cannot sort
array/map/struct/binary cells (``TypeError: unhashable type``). Every
gate query now projects complex values to scalars (``to_json``/``hex``);
these tests pin that contract so a future query can't silently regress
the gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as E

SCALAR_OK = (
    T.StringType,
    T.BooleanType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)

ALL_QUERIES = sorted(E.queries())


def test_exactly_fifty_gated_queries():
    # the driver checks only the first 50 rows of queries(); anything past
    # that silently gets no CORRECTNESS row (round-1 lesson: 57 entries →
    # 7 unverified). Keep the window exact and put folds in extra_queries.
    assert len(E.queries()) == 50


def test_every_gated_query_has_an_oracle():
    oracles = E.oracle_sql()
    missing = [q for q in E.queries() if q not in oracles]
    assert missing == [], f"queries without oracle_sql: {missing}"


def test_extra_queries_have_oracles_too():
    oracles = E.extra_oracle_sql()
    missing = [q for q in E.extra_queries() if q not in oracles]
    assert missing == [], f"extra queries without oracle: {missing}"


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_gate_output_is_scalar_only(spark, sf_dir, name):
    df = E.queries()[name](spark, sf_dir)
    bad = [
        f.name
        for f in df.schema.fields
        if not isinstance(f.dataType, SCALAR_OK)
    ]
    assert bad == [], (
        f"{name} emits non-scalar columns {bad} "
        f"({[str(df.schema[c].dataType) for c in bad]}) — the driver "
        "canonicalizer cannot sort these; project with to_json()/hex()"
    )
