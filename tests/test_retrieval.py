"""BM25 retrieval + BPE pair counting vs naive in-driver references."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from avro_spark.functions.retrieval import bm25_scores, bm25_topk, bpe_pair_counts

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat sat on the mat"),
    (3, "a slow green turtle walks under the log"),
    (4, "fox fox fox"),
    (5, ""),  # empty doc must not break postings or avgdl
]
QUERIES = [(10, "quick fox"), (11, "the turtle"), (12, "zebra")]


def naive_bm25(corpus, queries, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(corpus)
    dls = {d: len(t) for d, t in toks.items() if t}
    avgdl = sum(dls.values()) / len(dls)
    df = Counter()
    for t in toks.values():
        for term in set(t):
            df[term] += 1
    out = {}
    for qid, q in queries:
        for d, t in toks.items():
            score = 0.0
            for term in set(q.lower().split()):
                tf = t.count(term)
                if tf == 0:
                    continue
                idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
                score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[d] / avgdl))
            if score > 0:
                out[(qid, d)] = score
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def queries(spark):
    return spark.createDataFrame(QUERIES, "query_id long, query string")


def test_bm25_matches_naive(docs, queries):
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(docs, queries).collect()
    }
    want = naive_bm25(CORPUS, QUERIES)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], rel=1e-9)


def test_bm25_no_match_query_yields_nothing(docs, queries):
    out = bm25_scores(docs, queries).where("query_id = 12")
    assert out.count() == 0


def test_bm25_topk_rank_and_tiebreak(docs, queries):
    out = bm25_topk(docs, queries, k=2).where("query_id = 10").collect()
    want = naive_bm25(CORPUS, QUERIES)
    ranked = sorted(
        ((d, s) for (q, d), s in want.items() if q == 10),
        key=lambda x: (-x[1], x[0]),
    )[:2]
    assert [(r["doc_id"], r["rank"]) for r in sorted(out, key=lambda r: r["rank"])] == [
        (ranked[0][0], 1),
        (ranked[1][0], 2),
    ]


def test_bm25_repeated_query_terms_count_once(docs, spark):
    q1 = spark.createDataFrame([(1, "fox")], "query_id long, query string")
    q2 = spark.createDataFrame([(1, "fox fox fox")], "query_id long, query string")
    s1 = {r["doc_id"]: r["score"] for r in bm25_scores(docs, q1).collect()}
    s2 = {r["doc_id"]: r["score"] for r in bm25_scores(docs, q2).collect()}
    assert s1 == s2


def test_bm25_plan_broadcasts_query_side(docs, queries):
    plan = (
        bm25_scores(docs, queries)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bpe_pair_counts_matches_naive(docs):
    got = {
        (r["left"], r["right"]): r["n_pairs"]
        for r in bpe_pair_counts(docs, "text").collect()
    }
    want = Counter()
    for _d, t in CORPUS:
        toks = t.lower().split()
        for a, b in zip(toks, toks[1:]):
            want[(a, b)] += 1
    assert got == dict(want)


def test_bpe_pair_counts_min_count(docs):
    out = bpe_pair_counts(docs, "text", min_count=2).collect()
    # "the quick" and "quick brown" and "fox fox" appear twice
    got = {(r["left"], r["right"]) for r in out}
    assert got == {("the", "quick"), ("quick", "brown"), ("fox", "fox")}


def test_bpe_single_token_docs_contribute_nothing(spark):
    df = spark.createDataFrame([(1, "word"), (2, " "), (3, "a b")], "doc_id long, text string")
    out = bpe_pair_counts(df, "text").collect()
    assert {(r["left"], r["right"], r["n_pairs"]) for r in out} == {("a", "b", 1)}


# ---------------------------------------------------------------- RRF fusion
def test_rrf_fuse_matches_naive(spark):
    from avro_spark.functions.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, doc_id long, rank int"
    )
    got = {
        r["doc_id"]: r["rrf_score"] for r in rrf_fuse([a, b], k=60).collect()
    }
    want = {
        10: 1 / 61,
        11: 1 / 62 + 1 / 61,
        12: 1 / 63,
        13: 1 / 62,
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_rrf_topk_order(spark):
    from avro_spark.functions.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 10, 2)], "query_id long, doc_id long, rank int"
    )
    # symmetric ranks → equal scores → tiebreak by doc_id
    out = rrf_fuse([a, b], topk=2).orderBy("rank").collect()
    assert [(r["doc_id"], r["rank"]) for r in out] == [(10, 1), (11, 2)]


def test_rrf_empty_list_rejected():
    from avro_spark.functions.retrieval import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])
