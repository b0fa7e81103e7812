"""Naive-Bayes token classifier (functions/classifier.py)."""

import math

import pyspark.sql.functions as F

from avro_spark.functions.classifier import (
    nb_prior,
    nb_score,
    nb_train,
    nb_train_score,
)


def _seed(spark):
    rows = [
        (1, "good clean prose text", 1),
        (2, "good useful clean writing", 1),
        (3, "spam spam buy now", 0),
        (4, "buy spam click now", 0),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


class TestTrain:
    def test_weights_closed_form(self, spark):
        w = {r.tok: r.weight for r in nb_train(_seed(spark), "label").collect()}
        # vocab: good clean prose text useful writing spam buy now click = 10
        # tot_pos = 8 token instances, tot_neg = 8
        def expected(c_pos, c_neg):
            return math.log((c_pos + 1) / (8 + 10)) - math.log(
                (c_neg + 1) / (8 + 10)
            )

        assert math.isclose(w["good"], expected(2, 0))
        assert math.isclose(w["spam"], expected(0, 3))
        assert math.isclose(w["now"], expected(0, 2))
        assert len(w) == 10

    def test_prior(self, spark):
        p = nb_prior(_seed(spark), "label").collect()[0].prior
        assert math.isclose(p, math.log(2 / 2))


class TestScore:
    def test_separates_classes(self, spark):
        seed = _seed(spark)
        w, p = nb_train(seed, "label"), nb_prior(seed, "label")
        docs = spark.createDataFrame(
            [(10, "clean good prose"), (11, "buy spam now")],
            "doc_id long, text string",
        )
        s = {r.doc_id: r.score for r in nb_score(docs, w, p).collect()}
        assert s[10] > 0 > s[11]

    def test_oov_tokens_ignored(self, spark):
        seed = _seed(spark)
        w, p = nb_train(seed, "label"), nb_prior(seed, "label")
        docs = spark.createDataFrame(
            [(10, "zzz qqq unseen"), (11, "good zzz")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in nb_score(docs, w, p).collect()}
        assert out[10].n_scored == 0 and out[10].score == 0.0  # prior = 0
        assert out[11].n_scored == 1

    def test_every_doc_scored(self, spark):
        out = nb_train_score(_seed(spark), "label")
        assert out.count() == 4
        assert set(out.columns) == {"doc_id", "n_scored", "score"}

    def test_matches_oracle_on_testdata(self, spark, sf_dir):
        import duckdb

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        labeled = docs.withColumn(
            "label", (F.col("n_chars") >= 200).cast("int")
        )
        got = sorted(
            (r.doc_id, r.n_scored, round(r.score, 6))
            for r in nb_train_score(labeled, "label").collect()
        )
        con = duckdb.connect()
        con.sql(
            "create view documents as "
            f"select * from '{sf_dir}/documents.parquet'"
        )
        want = con.sql("""
            WITH labeled AS (
              SELECT doc_id, text,
                     CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS label
              FROM documents
            ),
            toks AS (
              SELECT doc_id, label,
                     unnest(regexp_split_to_array(trim(lower(text)),
                                                  '\\s+')) AS tok
              FROM labeled
            ),
            counts AS (
              SELECT tok, sum(label) AS c_pos, sum(1 - label) AS c_neg
              FROM toks GROUP BY tok
            ),
            totals AS (SELECT sum(c_pos) AS tot_pos, sum(c_neg) AS tot_neg,
                              count(*) AS vocab FROM counts),
            weights AS (
              SELECT tok,
                     ln((c_pos + 1.0) / (tot_pos + 1.0 * vocab))
                   - ln((c_neg + 1.0) / (tot_neg + 1.0 * vocab)) AS weight
              FROM counts, totals
            ),
            prior AS (SELECT ln(sum(label)::DOUBLE / sum(1 - label)) AS prior
                      FROM labeled),
            scored AS (
              SELECT t.doc_id, count(*) AS n_scored, sum(w.weight) AS w
              FROM toks t JOIN weights w USING (tok) GROUP BY 1
            )
            SELECT l.doc_id, coalesce(s.n_scored, 0) AS n_scored,
                   round(coalesce(s.w, 0.0) + p.prior, 6) AS score
            FROM labeled l LEFT JOIN scored s USING (doc_id), prior p
            ORDER BY doc_id
        """).fetchall()
        assert got == [tuple(w) for w in want]


class TestPlanShape:
    def test_totals_and_prior_broadcast_no_python(self, spark):
        out = nb_train_score(_seed(spark), "label")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
