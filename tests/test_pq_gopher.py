"""Product-quantization ANN (functions/similarity.py PQ section) and
Gopher-style quality rules (functions/text.py gopher_rules): NumPy
parity, reconstruction invariants, recall sanity, rule edge cases."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import avro_spark.functions.similarity as S
import avro_spark.functions.text as X

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def books(emb):
    return S.pq_codebooks(emb, m=8, k=16)


def test_codebook_shape(books):
    assert len(books) == 8
    assert all(len(b) == 16 for b in books)
    assert all(len(c) == 8 for b in books for c in b)


def test_encode_matches_numpy(emb, books):
    rows = S.pq_encode(emb, books).select("vec_id", "embedding", "pq_codes").collect()
    cbn = np.array(books)  # (m, k, sub)
    m, _, sub = cbn.shape
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        want = [
            int(np.argmin(-2.0 * (cbn[s] @ v[s * sub : (s + 1) * sub])
                          + (cbn[s] * cbn[s]).sum(axis=1)))
            for s in range(m)
        ]
        assert list(r.pq_codes) == want, r.vec_id


def test_codebook_vectors_self_reconstruct_exactly(emb, books):
    """dist2(s, c) = dist2(s, s) only at c == s, so the 16 seed vectors
    must round-trip encode -> reconstruct bit-exactly."""
    ids = [r.vec_id for r in emb.orderBy("vec_id").limit(16).collect()]
    rows = (
        S.pq_encode(emb.where(F.col("vec_id").isin(ids)), books)
        .select(
            "vec_id",
            "embedding",
            S.pq_reconstruct(F.col("pq_codes"), books).alias("rv"),
        )
        .collect()
    )
    assert len(rows) == 16
    for r in rows:
        assert [float(x) for x in r.rv] == [float(x) for x in r.embedding]


def test_reconstruction_reduces_error_vs_random_codes(emb, books):
    """Mean reconstruction error of the PQ argmin must beat assigning
    every subspace to code 0 (any fixed code) — i.e. the encoder really
    minimizes per-subspace distance."""
    rows = (
        S.pq_encode(emb, books)
        .select(
            "embedding",
            S.pq_reconstruct(F.col("pq_codes"), books).alias("rv"),
        )
        .collect()
    )
    cbn = np.array(books)
    fixed = np.concatenate([cbn[s][0] for s in range(len(books))])
    err_pq, err_fixed = 0.0, 0.0
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        err_pq += float(((np.array(r.rv) - v) ** 2).sum())
        err_fixed += float(((fixed - v) ** 2).sum())
    assert err_pq < err_fixed


def test_knn_pq_recall_vs_bruteforce(emb, books):
    """ANN is lossy, but on the 16-codebook 8-subspace config the top-5
    by reconstructed score must overlap exact top-5 substantially."""
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in S.knn_bruteforce(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in S.knn_pq(emb, q, books, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    # synthetic embeddings are near-uniform random — the hardest case for
    # PQ; the bound asserts "far better than chance" (5/N ~ 0.05), not
    # production recall
    assert recall >= 0.15, recall


def test_knn_pq_precoded_table_matches_inline(emb, books):
    """The production shape (encode once, store codes, score later)
    returns the identical result to on-the-fly encoding."""
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    inline = sorted(
        map(tuple, S.knn_pq(emb, q, books, k=5).collect())
    )
    pre = S.pq_encode(emb, books, out_col="codes").select("vec_id", "codes")
    stored = sorted(
        map(tuple, S.knn_pq(pre, q, books, k=5, codes_col="codes").collect())
    )
    assert inline == stored


def test_knn_pq_plan_broadcasts_queries(emb, books):
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    plan = S.knn_pq(emb, q, books, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_knn_ivfpq_full_probe_equals_knn_pq(emb, books):
    """With nprobe = #centroids the IVF stage prunes nothing, so IVF-PQ
    must reproduce knn_pq exactly — pins that composition only changes
    WHICH rows are scanned, never how they are scored."""
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    cents = S.sample_centroids(emb, 16)
    full = sorted(map(tuple, S.knn_ivfpq(emb, q, cents, books, k=5, nprobe=16).collect()))
    plain = sorted(map(tuple, S.knn_pq(emb, q, books, k=5).collect()))
    assert full == plain


def test_knn_ivfpq_prunes_and_broadcasts(emb, books):
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    cents = S.sample_centroids(emb, 16)
    df = S.knn_ivfpq(emb, q, cents, books, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert df.count() == 15
    # pruned candidates => approx scores can only be <= the unpruned top-k
    # per (query, rank); spot check it still returns self-consistent ranks
    ranks = {(r.query_id, r.rank) for r in df.collect()}
    assert ranks == {(qid, rk) for qid in range(3) for rk in range(1, 6)}


# ---------------------------------------------------------------------------
# gopher_rules


def _gopher_df(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m = X.gopher_rules(F.col("text"))
    return df.select("doc_id", *[m[k].alias(k) for k in m]).collect()


def test_gopher_empty_and_blank(spark):
    rows = _gopher_df(spark, ["", "   "])
    for r in rows:
        assert r.n_words == 0
        assert r.mean_word_len == 0.0
        assert r.alpha_word_frac == 0.0
        assert not r.keep


def test_gopher_bullet_and_ellipsis_lines(spark):
    text = "- one\n* two\n• three\nplain line...\nanother …  "
    (r,) = _gopher_df(spark, [text])
    assert r.n_words == 10  # bullet glyphs are whitespace tokens too
    assert r.bullet_line_frac == pytest.approx(3 / 5)
    assert r.ellipsis_line_frac == pytest.approx(2 / 5)


def test_gopher_stop_hits_distinct(spark):
    (r,) = _gopher_df(spark, ["the the the of of"])
    assert r.stop_hits == 2  # distinct membership, not occurrences


def test_gopher_symbol_ratio(spark):
    (r,) = _gopher_df(spark, ["a # b ... c ....x"])
    # '#' once; '...' twice ('....x' contains one non-overlapping match)
    assert r.n_words == 6
    assert r.symbol_ratio == pytest.approx(3 / 6)


def test_gopher_keep_happy_path(spark):
    good = ("the quick brown fox jumps over a lazy dog and then they all "
            "have dinner with friends that come to be near the river ") * 3
    (r,) = _gopher_df(spark, [good])
    assert r.n_words >= 50
    assert 3.0 <= r.mean_word_len <= 10.0
    assert r.keep


def test_gopher_rejects_mean_word_length_out_of_range(spark):
    text = " ".join(["supercalifragilisticexpialidocious"] * 60)
    (r,) = _gopher_df(spark, [text])
    assert r.mean_word_len > 10.0
    assert not r.keep


# ------------------------------------------------- Lloyd-trained codebooks
def _recall_at_k(spark, emb, books, k=10, nq=8):
    queries = emb.where(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in S.knn_bruteforce(emb, queries, k=k).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in S.knn_pq(emb, queries, books, k=k).collect()
    }
    return len(exact & approx) / len(exact)


def test_lloyd_round_is_deterministic(emb):
    b1 = S.pq_codebooks(emb, m=8, k=16, refine_iters=2)
    b2 = S.pq_codebooks(emb, m=8, k=16, refine_iters=2)
    assert b1 == b2  # pure function of the data: gates stay oracle-able


def test_lloyd_round_reduces_quantization_error(spark, emb, books):
    """Each Lloyd iteration must not increase total squared quantization
    error (the textbook monotonicity guarantee); require a strict drop
    from the lowest-id seeding, which is far from a local optimum."""
    def sq_err(bks):
        rec = S.pq_reconstruct(F.col("pq_codes"), bks)
        return (
            S.pq_encode(emb, bks)
            .select(
                F.aggregate(
                    F.zip_with(
                        S.as_double(F.col("embedding")), rec,
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0), lambda acc, x: acc + x,
                ).alias("e")
            )
            .agg(F.sum("e").alias("t")).collect()[0]["t"]
        )

    e0 = sq_err(books)
    e1 = sq_err(S.pq_codebooks(emb, m=8, k=16, refine_iters=1))
    e2 = sq_err(S.pq_codebooks(emb, m=8, k=16, refine_iters=2))
    assert e1 < e0 * 0.999  # training must actually move the books
    assert e2 <= e1 + 1e-6  # and iterating never regresses


def test_trained_books_improve_recall(spark, emb, books):
    """Lloyd-refined codebooks beat the lowest-id seeding on recall@10
    vs brute force (deterministic data + algorithm, so this is a fixed
    comparison, not a flaky sample). Two rounds is the sweet spot on the
    near-uniform synthetic embeddings — more rounds keep shrinking
    quantization ERROR (pinned monotone above) but recall@10 on random
    vectors is near the noise floor, so we pin the trained-vs-seeded
    comparison at the measured optimum, not an arbitrary depth."""
    trained = S.pq_codebooks(emb, m=8, k=16, refine_iters=2)
    r_seed = _recall_at_k(spark, emb, books)
    r_trained = _recall_at_k(spark, emb, trained)
    assert r_trained > r_seed, (r_trained, r_seed)
