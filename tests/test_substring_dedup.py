"""Duplicate-span removal (functions/substring_dedup.py)."""

import pyspark.sql.functions as F
import pytest

from avro_spark.functions.substring_dedup import (
    duplicate_grams,
    remove_duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRemoveDuplicateSpans:
    def test_shared_span_removed_everywhere(self, spark):
        boiler = "all rights reserved contact us terms of service"
        df = _docs(
            spark,
            [
                (1, f"alpha beta {boiler} gamma"),
                (2, f"delta {boiler} epsilon zeta"),
            ],
        )
        out = {
            r.doc_id: (r.clean_text, r.n_removed)
            for r in remove_duplicate_spans(df, n=8, min_docs=2).collect()
        }
        assert out[1] == ("alpha beta gamma", 8)
        assert out[2] == ("delta epsilon zeta", 8)

    def test_long_shared_span_fully_covered(self, spark):
        # a shared span of length L > n is covered by its constituent
        # n-grams — removed in full, not just the first n tokens
        span = " ".join(f"w{i}" for i in range(12))
        df = _docs(spark, [(1, f"a {span} b"), (2, f"c {span}")])
        out = {
            r.doc_id: (r.clean_text, r.n_removed)
            for r in remove_duplicate_spans(df, n=8, min_docs=2).collect()
        }
        assert out[1] == ("a b", 12)
        assert out[2] == ("c", 12)

    def test_unique_text_untouched(self, spark):
        df = _docs(
            spark,
            [(1, "one two three four five six seven eight nine"),
             (2, "ten eleven twelve thirteen fourteen fifteen sixteen "
                 "seventeen eighteen")],
        )
        out = remove_duplicate_spans(df, n=8, min_docs=2).collect()
        assert all(r.n_removed == 0 for r in out)
        assert {r.clean_text for r in out} == {
            "one two three four five six seven eight nine",
            "ten eleven twelve thirteen fourteen fifteen sixteen "
            "seventeen eighteen",
        }

    def test_short_docs_survive(self, spark):
        # docs with fewer than n tokens contribute no grams and pass
        # through unchanged (the sequence() stop stays non-negative)
        df = _docs(spark, [(1, "tiny doc"), (2, "tiny doc")])
        out = remove_duplicate_spans(df, n=8, min_docs=2).collect()
        assert sorted((r.doc_id, r.clean_text, r.n_removed) for r in out) == [
            (1, "tiny doc", 0),
            (2, "tiny doc", 0),
        ]

    def test_whole_doc_boilerplate_empty_string(self, spark):
        t = "a b c d e f g h"
        df = _docs(spark, [(1, t), (2, t)])
        out = {r.doc_id: (r.clean_text, r.n_removed)
               for r in remove_duplicate_spans(df, n=8, min_docs=2).collect()}
        assert out == {1: ("", 8), 2: ("", 8)}

    def test_min_docs_threshold(self, spark):
        t = "a b c d e f g h"
        df = _docs(spark, [(1, t), (2, t), (3, "x " + t)])
        kept = remove_duplicate_spans(df, n=8, min_docs=4).collect()
        assert all(r.n_removed == 0 for r in kept)
        removed = remove_duplicate_spans(df, n=8, min_docs=3).collect()
        assert all(r.n_removed == 8 for r in removed)

    def test_within_doc_repeat_not_cross_doc(self, spark):
        # repeated WITHIN one doc only: count(DISTINCT doc) = 1 → kept
        t = "a b c d e f g h a b c d e f g h"
        df = _docs(spark, [(1, t), (2, "totally different words here "
                                       "padding out the gram count")])
        out = {r.doc_id: r.n_removed
               for r in remove_duplicate_spans(df, n=8, min_docs=2).collect()}
        assert out[1] == 0

    def test_duplicate_grams_counts(self, spark):
        t = "a b c d e f g h"
        df = _docs(spark, [(1, t), (2, t), (3, t)])
        dup = duplicate_grams(df, n=8, min_docs=2).collect()
        assert len(dup) == 1 and dup[0].n_docs == 3

    def test_matches_oracle_on_testdata(self, spark, sf_dir):
        import duckdb

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        got = sorted(
            (r.doc_id, r.clean_text, r.n_removed)
            for r in remove_duplicate_spans(docs, n=8, min_docs=2).collect()
        )
        con = duckdb.connect()
        con.sql(
            "create view documents as "
            f"select * from '{sf_dir}/documents.parquet'"
        )
        n = 8
        want = con.sql(f"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
              FROM documents
            ),
            grams AS (
              SELECT doc_id, i - 1 AS pos,
                     list_aggregate(t[i:i+{n - 1}], 'string_agg', ' ') AS gram
              FROM toks, unnest(generate_series(1, len(t) - {n - 1})) AS s(i)
              WHERE len(t) >= {n}
            ),
            dup AS (SELECT gram FROM grams GROUP BY gram
                    HAVING count(DISTINCT doc_id) >= 2),
            cov AS (
              SELECT DISTINCT g.doc_id, u.ti
              FROM grams g JOIN dup d USING (gram),
                   unnest(generate_series(g.pos, g.pos + {n - 1})) AS u(ti)
            ),
            covagg AS (SELECT doc_id, count(*) AS n_removed FROM cov
                       GROUP BY 1),
            flat AS (
              SELECT t.doc_id, t.t[i] AS tok, i - 1 AS ti
              FROM toks t, unnest(generate_series(1, len(t.t))) AS s(i)
            ),
            kept AS (
              SELECT f.doc_id,
                     coalesce(string_agg(f.tok, ' ' ORDER BY f.ti)
                              FILTER (WHERE c.ti IS NULL), '') AS clean_text
              FROM flat f LEFT JOIN cov c
                ON c.doc_id = f.doc_id AND c.ti = f.ti
              GROUP BY 1
            )
            SELECT k.doc_id, k.clean_text, coalesce(ca.n_removed, 0)
            FROM kept k LEFT JOIN covagg ca USING (doc_id)
            ORDER BY doc_id
        """).fetchall()
        assert got == [tuple(w) for w in want]


class TestPlanShape:
    def test_no_python_stages_and_two_shuffles(self, spark):
        df = _docs(spark, [(1, "a b c d e f g h i"), (2, "j k l m n o p q")])
        plan = remove_duplicate_spans(df)._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "mapInPandas" not in plan.lower()
