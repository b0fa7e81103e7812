"""Corpus-statistics operators (functions/stats.py): heavy hitters,
TF-IDF, per-group quantiles (exact vs DuckDB quantile_cont, approx
within rank tolerance), and the bigram-LM scorer checked against a
pure-Python reference implementation."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from avro_spark.functions import stats as S

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "source")
        .cache()
    )
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def local_docs(docs):
    return [(r["doc_id"], r["text"], r["source"]) for r in docs.collect()]


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def test_heavy_hitters_matches_counter(docs, local_docs):
    got = S.heavy_hitters(docs, k=20).collect()
    counts = Counter(t for _, text, _ in local_docs for t in _tokens(text))
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["term"], r["n"]) for r in got] == want


def test_heavy_hitters_min_count(docs):
    got = S.heavy_hitters(docs, k=1000, min_count=50).collect()
    assert got and all(r["n"] >= 50 for r in got)


def test_heavy_hitters_plan_is_take_ordered(docs):
    plan = S.heavy_hitters(docs, k=20)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition top-k, no global sort


def test_tfidf_topk_matches_reference(docs, local_docs):
    got = S.tfidf_topk(docs, k=3).collect()
    n_docs = len(local_docs)
    tf: dict[tuple, int] = {}
    df_: Counter = Counter()
    for doc_id, text, _ in local_docs:
        c = Counter(_tokens(text))
        for term, n in c.items():
            tf[(doc_id, term)] = n
            df_[term] += 1
    want = {}
    for doc_id, _, _ in local_docs:
        scored = [
            (term, n, n * (math.log((1 + n_docs) / (1 + df_[term])) + 1.0))
            for (d, term), n in tf.items()
            if d == doc_id
        ]
        scored.sort(key=lambda x: (-x[2], x[0]))
        for rank, (term, n, score) in enumerate(scored[:3], 1):
            want[(doc_id, rank)] = (term, n, score)
    assert len(got) == len(want)
    for r in got:
        term, n, score = want[(r["doc_id"], r["rank"])]
        assert r["term"] == term and r["tf"] == n
        assert r["score"] == pytest.approx(score, rel=1e-12)


def test_group_quantiles_matches_duckdb(docs, local_docs):
    got = {
        (r["source"], r["q"]): r["value"]
        for r in S.group_quantiles(
            docs.withColumn("len", F.length("text")), "source", "len"
        ).collect()
    }
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH g AS (
            SELECT source,
                   quantile_cont(length(text), 0.25) AS q25,
                   quantile_cont(length(text), 0.5) AS q50,
                   quantile_cont(length(text), 0.75) AS q75
            FROM read_parquet('{SF_DIR}/documents.parquet')
            GROUP BY source
        )
        SELECT source, 0.25 AS q, q25 AS value FROM g
        UNION ALL SELECT source, 0.5, q50 FROM g
        UNION ALL SELECT source, 0.75, q75 FROM g
        """
    ).fetchall()
    want = [(s, float(q), v) for s, q, v in want]
    assert len(got) == len(want)
    for source, q, value in want:
        assert got[(source, q)] == pytest.approx(value, rel=1e-12)


def test_group_quantiles_approx_within_tolerance(docs):
    lens = docs.withColumn("len", F.length("text"))
    exact = {
        (r["source"], r["q"]): r["value"]
        for r in S.group_quantiles(lens, "source", "len").collect()
    }
    approx = S.group_quantiles_approx(lens, "source", "len", accuracy=10000).collect()
    for r in approx:
        # sf0.001 groups are small: at accuracy=10000 the sketch is exact
        # up to the nearest-rank vs interpolated convention — allow the
        # one-rank gap
        assert abs(r["value"] - exact[(r["source"], r["q"])]) <= max(
            5.0, 0.05 * exact[(r["source"], r["q"])]
        )


def _reference_bigram_lm(local_docs, alpha=1.0):
    pair_c: Counter = Counter()
    left_c: Counter = Counter()
    vocab = set()
    for _, text, _ in local_docs:
        toks = _tokens(text)
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            pair_c[(a, b)] += 1
            left_c[a] += 1
    v = len(vocab)
    out = {}
    for doc_id, text, _ in local_docs:
        toks = _tokens(text)
        lps = [
            math.log((pair_c[(a, b)] + alpha) / (left_c[a] + alpha * v))
            for a, b in zip(toks, toks[1:])
        ]
        out[doc_id] = (len(lps), sum(lps) / len(lps) if lps else None)
    return out


def test_bigram_lm_scores_match_reference(docs, local_docs):
    got = S.bigram_lm_scores(docs).collect()
    want = _reference_bigram_lm(local_docs)
    assert len(got) == len(want)
    for r in got:
        n, avg = want[r["doc_id"]]
        assert r["n_bigrams"] == n
        if avg is None:
            assert r["avg_logprob"] is None
        else:
            assert r["avg_logprob"] == pytest.approx(avg, rel=1e-9)


def test_bigram_lm_short_docs_null(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two tokens")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in S.bigram_lm_scores(docs).collect()}
    assert got[1]["n_bigrams"] == 0 and got[1]["avg_logprob"] is None
    assert got[2]["n_bigrams"] == 0 and got[2]["avg_logprob"] is None
    assert got[3]["n_bigrams"] == 1


def test_bigram_lm_plan_has_no_python_stage(docs):
    plan = (
        S.bigram_lm_scores(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# Count-Min sketch


def _exact_counts(docs):
    return {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_cms_never_underestimates(spark, docs):
    from avro_spark.functions.stats import cms_build, cms_estimate

    sk = cms_build(docs, "source", d=4, w=64)
    keys = docs.select("source").distinct()
    est = {
        r.source: r.cms_estimate
        for r in cms_estimate(sk, keys, "source", d=4, w=64).collect()
    }
    exact = _exact_counts(docs)
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)


def test_cms_exact_when_wide_enough(spark, docs):
    """With w far above the distinct-key count, collisions are unlikely
    across all 4 rows and min() recovers exact counts."""
    from avro_spark.functions.stats import cms_build, cms_estimate

    sk = cms_build(docs, "source", d=4, w=8192)
    keys = docs.select("source").distinct()
    est = {
        r.source: r.cms_estimate
        for r in cms_estimate(sk, keys, "source", d=4, w=8192).collect()
    }
    assert est == _exact_counts(docs)


def test_cms_merge_equals_whole(spark, docs):
    from avro_spark.functions.stats import cms_build, cms_merge

    a = cms_build(docs.where(F.col("doc_id") % 2 == 0), "source", d=4, w=64)
    b = cms_build(docs.where(F.col("doc_id") % 2 == 1), "source", d=4, w=64)
    merged = sorted(map(tuple, cms_merge(a, b).collect()))
    whole = sorted(map(tuple, cms_build(docs, "source", d=4, w=64).collect()))
    assert merged == whole


def test_cms_weighted(spark):
    from avro_spark.functions.stats import cms_build, cms_estimate

    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("b", 7)], "k string, wt long"
    )
    sk = cms_build(df, "k", d=4, w=1024, weight_col="wt")
    est = {
        r.k: r.cms_estimate
        for r in cms_estimate(sk, df.select("k").distinct(), "k", d=4, w=1024).collect()
    }
    assert est == {"a": 15, "b": 7}


def test_cms_estimate_preserves_duplicate_key_rows_without_shuffle(spark):
    """Each keys row comes back exactly once (duplicates preserved) and
    the plan has no exchange introduced by the lookup (d broadcast joins,
    review catch: the groupBy form shuffled keys x d rows)."""
    from avro_spark.functions.stats import cms_build, cms_estimate

    data = spark.createDataFrame([("a",)] * 3 + [("b",)], "k string")
    sk = cms_build(data, "k", d=4, w=256)
    dup_keys = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    out = cms_estimate(sk, dup_keys, "k", d=4, w=256)
    rows = sorted((r.k, r.cms_estimate) for r in out.collect())
    assert rows == [("a", 3), ("a", 3), ("b", 1)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_cms_sketch_size_bounded(spark, docs):
    from avro_spark.functions.stats import cms_build

    sk = cms_build(docs, "source", d=4, w=64)
    assert sk.count() <= 4 * 64
