"""Persisted inverted (BM25) text index (r9): postings materialized
once, probes read only the query terms' buckets — the lexical cousin
of the MinHash/IVF/IVF-PQ persisted indexes, under the same meta-row +
marker + append-token + lease discipline."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

import avro_spark.functions.dedup as D
import avro_spark.functions.retrieval as R
from avro_spark.functions import text_index as TI

from conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _queries(spark):
    return spark.createDataFrame(
        [(1, "the data pipeline"), (2, "model training loss"),
         (3, "zz quantum unmatched"), (4, "  "), (5, "THE the tHe")],
        "query_id long, query string",
    )


def _rows(df, idc="doc_id"):
    return [
        (r.query_id, r.rank, r[idc], round(r.score, 9))
        for r in df.orderBy("query_id", "rank").collect()
    ]


def test_probe_equals_bm25_topk(spark, tmp_path):
    """The indexed probe is bm25_topk verbatim: same candidates, same
    ranks, scores equal to fp tolerance (the index path computes avgdl
    as meta-counter division instead of F.avg)."""
    docs, qs = _docs(spark), _queries(spark)
    idx = str(tmp_path / "ti")
    TI.write_text_index(docs, idx, n_buckets=16)
    got = TI.bm25_indexed(spark, idx, qs, k=7)
    want = R.bm25_topk(docs, qs, k=7)
    g = got.orderBy("query_id", "rank").collect()
    w = want.orderBy("query_id", "rank").collect()
    assert [(r.query_id, r.rank, r.doc_id) for r in g] == [
        (r.query_id, r.rank, r.doc_id) for r in w]
    assert g, "query set matched nothing — the fixture is broken"
    for a, b in zip(g, w):
        assert abs(a.score - b.score) < 1e-9
    # repeated query terms count once (set semantics): query 5 is
    # 'the' three times and must score like a single-term query
    one = spark.createDataFrame([(9, "the")], "query_id long, query string")
    s1 = {(r.doc_id, round(r.score, 9))
          for r in TI.bm25_indexed(spark, idx, one, k=7).collect()}
    s5 = {(r.doc_id, round(r.score, 9)) for r in g if r.query_id == 5}
    assert s5 == s1


def test_append_equals_build_at_once(spark, tmp_path):
    """Two appends over disjoint halves probe exactly like one build:
    postings rows identical, meta counters sum to the same N/avgdl."""
    docs, qs = _docs(spark), _queries(spark)
    whole = str(tmp_path / "whole")
    grown = str(tmp_path / "grown")
    TI.write_text_index(docs, whole, n_buckets=8)
    TI.write_text_index(docs.where(F.col("doc_id") % 2 == 0), grown,
                        n_buckets=8)
    TI.write_text_index(docs.where(F.col("doc_id") % 2 == 1), grown,
                        n_buckets=None, mode="append", append_token="b1")
    assert _rows(TI.bm25_indexed(spark, grown, qs, k=5)) == _rows(
        TI.bm25_indexed(spark, whole, qs, k=5))
    mw = TI._read_text_meta(spark, whole)
    mg = TI._read_text_meta(spark, grown)
    assert (mw["n_docs"], mw["n_docs_tok"], mw["sum_dl"]) == (
        mg["n_docs"], mg["n_docs_tok"], mg["sum_dl"])


def test_append_token_exactly_once(spark, tmp_path):
    """A blind retry of a COMMITTED append no-ops on the token; a
    DIFFERENT batch against a dead (mid-flight) append is refused."""
    docs = _docs(spark)
    idx = str(tmp_path / "tok")
    half = docs.where(F.col("doc_id") < 250)
    rest = docs.where(F.col("doc_id") >= 250)
    TI.write_text_index(half, idx, n_buckets=8)
    TI.write_text_index(rest, idx, mode="append", append_token="b7",
                        n_buckets=None)
    m1 = TI._read_text_meta(spark, idx)
    TI.write_text_index(rest, idx, mode="append", append_token="b7",
                        n_buckets=None)  # retry: structural no-op
    m2 = TI._read_text_meta(spark, idx)
    assert m1 == m2
    assert TI.text_index_stats(spark, idx)["duplicate_rows"] == 0
    # dead append with pending_token p1 → a batch with p2 is refused
    TI._write_text_meta(spark, idx, m1["n_buckets"], "doc_id",
                        "__appending__", m1["n_docs"], m1["n_docs_tok"],
                        m1["sum_dl"], m1["token"], pending_token="p1")
    with pytest.raises(ValueError, match="in-flight append"):
        TI.write_text_index(rest, idx, mode="append", append_token="p2",
                            n_buckets=None)


def test_mid_append_crash_heals_on_same_token_retry(spark, tmp_path):
    """Crash AFTER the postings append but BEFORE commit: the retry
    re-appends (duplicate rows), commits counters ONCE, and probes
    absorb the residue via (term, id) dropDuplicates — answers equal
    the never-crashed index."""
    docs, qs = _docs(spark), _queries(spark)
    clean = str(tmp_path / "clean")
    crashed = str(tmp_path / "crashed")
    half = docs.where(F.col("doc_id") < 250)
    rest = docs.where(F.col("doc_id") >= 250)
    for p in (clean, crashed):
        TI.write_text_index(half, p, n_buckets=8)
    TI.write_text_index(rest, clean, mode="append", append_token="b1",
                        n_buckets=None)
    # simulate the dead attempt: marker + data landed, commit did not
    m = TI._read_text_meta(spark, crashed)
    TI._write_text_meta(spark, crashed, m["n_buckets"], "doc_id",
                        "__appending__", m["n_docs"], m["n_docs_tok"],
                        m["sum_dl"], m["token"], pending_token="b1")
    base = rest.select(
        F.col("doc_id"),
        TI.ws_tokens(F.lower(F.col("text"))).alias("_t"))
    (base.select("doc_id", F.size("_t").alias("dl"),
                 F.explode("_t").alias("term"))
     .groupBy("doc_id", "dl", "term")
     .agg(F.count("*").cast("long").alias("tf"))
     .withColumn("bucket", TI._bucket_expr(F.col("term"), m["n_buckets"]))
     .select("term", "doc_id", "tf", "dl", "bucket")
     .write.mode("append").partitionBy("bucket")
     .parquet(f"{crashed}/postings"))
    with pytest.raises(ValueError, match="status"):
        TI.bm25_indexed(spark, crashed, qs)  # mid-append probes refuse
    TI.write_text_index(rest, crashed, mode="append", append_token="b1",
                        n_buckets=None)  # the healing retry
    assert TI.text_index_stats(spark, crashed)["duplicate_rows"] > 0
    assert _rows(TI.bm25_indexed(spark, crashed, qs, k=5)) == _rows(
        TI.bm25_indexed(spark, clean, qs, k=5))
    mc = TI._read_text_meta(spark, crashed)
    ml = TI._read_text_meta(spark, clean)
    assert (mc["n_docs"], mc["n_docs_tok"], mc["sum_dl"]) == (
        ml["n_docs"], ml["n_docs_tok"], ml["sum_dl"])
    # compaction drops the residue and keeps the token
    TI.compact_text_index(spark, crashed)
    st = TI.text_index_stats(spark, crashed)
    assert st["duplicate_rows"] == 0
    assert TI._read_text_meta(spark, crashed)["token"] == "b1"
    assert _rows(TI.bm25_indexed(spark, crashed, qs, k=5)) == _rows(
        TI.bm25_indexed(spark, clean, qs, k=5))


def test_drift_and_status_refusals(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "drift")
    TI.write_text_index(docs, idx, n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        TI.write_text_index(docs, idx, mode="append", n_buckets=16)
    with pytest.raises(ValueError, match="id_col"):
        TI.write_text_index(docs.withColumnRenamed("doc_id", "other"),
                            idx, id_col="other", mode="append",
                            n_buckets=None)
    m = TI._read_text_meta(spark, idx)
    TI._write_text_meta(spark, idx, 8, "doc_id", "__compacting__",
                        m["n_docs"], m["n_docs_tok"], m["sum_dl"])
    with pytest.raises(ValueError, match="finish the in-flight"):
        TI.write_text_index(docs, idx, mode="append", n_buckets=None)
    TI._write_text_meta(spark, idx, 8, "doc_id", "__building__", 0, 0, 0)
    with pytest.raises(ValueError, match="mid-rebuild"):
        TI.write_text_index(docs, idx, mode="append", n_buckets=None)
    with pytest.raises(ValueError, match="no text index meta"):
        TI.bm25_indexed(spark, str(tmp_path / "nope"),
                        _queries(spark))


def test_compaction_crash_recovery(spark, tmp_path):
    """A compaction that died after staging ``postings_compact`` (the
    '__compacting__' marker is down) finishes the swap on re-run."""
    docs, qs = _docs(spark), _queries(spark)
    idx = str(tmp_path / "comp")
    TI.write_text_index(docs.where(F.col("doc_id") < 250), idx,
                        n_buckets=8)
    TI.write_text_index(docs.where(F.col("doc_id") >= 250), idx,
                        mode="append", append_token="b1", n_buckets=None)
    want = _rows(TI.bm25_indexed(spark, idx, qs, k=5))
    before = TI.text_index_stats(spark, idx)["postings_files"]
    m = TI._read_text_meta(spark, idx)
    post = spark.read.parquet(f"{idx}/postings")
    post.dropDuplicates(["term", "doc_id"]) \
        .repartition(m["n_buckets"], F.col("bucket")) \
        .write.mode("overwrite").partitionBy("bucket") \
        .parquet(f"{idx}/postings_compact")
    TI._write_text_meta(spark, idx, m["n_buckets"], "doc_id",
                        "__compacting__", m["n_docs"], m["n_docs_tok"],
                        m["sum_dl"], m["token"])
    TI.compact_text_index(spark, idx)  # finish-the-swap
    assert TI._read_text_meta(spark, idx)["status"] == "committed"
    assert TI.text_index_stats(spark, idx)["postings_files"] < before
    assert _rows(TI.bm25_indexed(spark, idx, qs, k=5)) == want


def test_string_doc_ids_native(spark, tmp_path):
    """String/UUID-shaped doc ids work end-to-end — the index keeps the
    native id type (the r8 id-contract lesson: no blind long casts)."""
    docs = _docs(spark).select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("doc_id"), "text")
    qs = _queries(spark)
    idx = str(tmp_path / "sid")
    TI.write_text_index(docs, idx, n_buckets=8)
    got = TI.bm25_indexed(spark, idx, qs, k=5)
    assert dict(got.dtypes)["doc_id"] == "string"
    # ranks compare rank-free: ties break by the NATIVE id ordering,
    # and 'doc-138' < 'doc-70' lexicographically while 70 < 138
    g = {(r.query_id, r.doc_id, round(r.score, 6)) for r in got.collect()}
    want = {(r.query_id, f"doc-{r.doc_id}", round(r.score, 6))
            for r in R.bm25_topk(_docs(spark), qs, k=5).collect()}
    assert g == want and g


def test_probe_pushdown_and_fallback(spark, tmp_path):
    """The probe scan carries BOTH the bucket partition filter and the
    term In pushdown; past max_pushdown_terms it falls back to the
    broadcast term join with the same answer."""
    docs, qs = _docs(spark), _queries(spark)
    idx = str(tmp_path / "push")
    TI.write_text_index(docs, idx, n_buckets=16)
    probed = TI.bm25_indexed(spark, idx, qs, k=5,
                             pushdown_min_index_bytes=0)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("bucket" in g for g in pf), plan[:2000]
    assert "In(term" in plan, plan[:2000]
    fb = TI.bm25_indexed(spark, idx, qs, k=5, max_pushdown_terms=1,
                         pushdown_min_index_bytes=0)
    assert "In(term" not in (
        fb._jdf.queryExecution().executedPlan().toString())
    assert _rows(fb) == _rows(probed)
    # r11 size-adaptive default: a tiny index skips the term collect
    # (single-action probe, broadcast term join) — no In(term...)
    # pushdown, IDENTICAL rankings
    adaptive = TI.bm25_indexed(spark, idx, qs, k=5)
    assert "In(term" not in (
        adaptive._jdf.queryExecution().executedPlan().toString())
    assert _rows(adaptive) == _rows(probed)


def test_single_writer_lease(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "lease")
    TI.write_text_index(docs, idx, n_buckets=8)
    t = D.acquire_index_lease(idx, "hold")
    with pytest.raises(ValueError, match="live writer lease"):
        TI.write_text_index(docs, idx, mode="append", n_buckets=None,
                            append_token="x")
    with pytest.raises(ValueError, match="live writer lease"):
        TI.compact_text_index(spark, idx)
    D.release_index_lease(idx, t)
    TI.compact_text_index(spark, idx)  # lease released → proceeds


def test_streaming_sink_replay_idempotent(spark, tmp_path):
    """The foreachBatch sink is exactly-once across replays: a
    re-delivered batch id is skipped via the registry, and a crash
    between the append commit and the registry write is absorbed by
    the append token (counters land once, probe unchanged)."""
    docs, qs = _docs(spark), _queries(spark)
    idx = str(tmp_path / "stream")
    TI.write_text_index(docs.where(F.col("doc_id") < 300), idx,
                        n_buckets=8)
    sink = TI._stream_text_sink(idx)
    batch = docs.where(F.col("doc_id") >= 300)
    sink(batch, 0)
    m1 = TI._read_text_meta(spark, idx)
    want = _rows(TI.bm25_indexed(spark, idx, qs, k=5))
    sink(batch, 0)  # full replay: registry skip
    assert TI._read_text_meta(spark, idx) == m1
    # crash window: batch recorded nowhere but append committed —
    # simulate by clearing the registry and replaying
    import shutil

    shutil.rmtree(f"{idx}/batches")
    sink(batch, 0)  # token no-op inside the append
    assert TI._read_text_meta(spark, idx)["n_docs"] == m1["n_docs"]
    assert _rows(TI.bm25_indexed(spark, idx, qs, k=5)) == want
    assert TI.text_index_stats(spark, idx)["duplicate_rows"] == 0


def test_stats_report(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "stats")
    TI.write_text_index(docs, idx, n_buckets=8)
    st = TI.text_index_stats(spark, idx)
    assert st["status"] == "committed"
    assert st["n_docs"] == docs.count()
    assert st["postings_rows"] > 0 and st["postings_bytes"] > 0
    assert st["duplicate_rows"] == 0
    assert st["bucket_row_skew"] >= 1.0
    # footer rows agree with a real scan
    assert st["postings_rows"] == spark.read.parquet(
        f"{idx}/postings").count()


def test_tie_decimals_ranking(spark, tmp_path):
    """Docs with identical term-score multisets are EXACT score ties
    and must order by doc id under tie_decimals (the oracle mode);
    where scores differ beyond the rounding, both modes agree."""
    docs = _docs(spark)
    twin = docs.where(F.col("doc_id") == 7).select(
        (F.col("doc_id") + 100_000).alias("doc_id"), "text")
    idx = str(tmp_path / "tie")
    TI.write_text_index(
        docs.select("doc_id", "text").unionByName(twin), idx, n_buckets=8)
    # query doc 7's own opening words so the twin pair ranks high
    own = " ".join(
        docs.where(F.col("doc_id") == 7).head().text.lower().split()[:3])
    qs = _queries(spark).unionByName(spark.createDataFrame(
        [(6, own)], "query_id long, query string"))
    rounded = _rows(TI.bm25_indexed(spark, idx, qs, k=20, tie_decimals=6))
    raw = _rows(TI.bm25_indexed(spark, idx, qs, k=20))
    # raw mode may order the twins either way — and at the k boundary
    # may even admit the OTHER twin (fp-sum association noise, the
    # hazard tie_decimals exists for), so compare the two modes only
    # up to the orderless (query, score) multiset (twin scores are
    # equal, so a boundary straddle is invisible there)
    assert sorted((q, s) for q, _, d, s in rounded) == sorted(
        (q, s) for q, _, d, s in raw)
    # under tie_decimals the twin DETERMINISTICALLY holds the very
    # next rank after doc 7 (identical rounded score → doc id order)
    by_q = {}
    for q, rank, d, s in rounded:
        by_q.setdefault(q, {})[d] = (rank, s)
    seen = 0
    for q, m in by_q.items():
        if 7 in m and m[7][0] < 20:  # twin fits inside k
            assert m.get(100_007) == (m[7][0] + 1, m[7][1])
            seen += 1
    assert seen > 0, "fixture never surfaced the tie pair"


def test_zero_postings_corpus(spark, tmp_path):
    """An index over an all-empty corpus (zero postings) still probes,
    appends, compacts, and reports stats — the fileless-partition-dir
    UNABLE_TO_INFER_SCHEMA hazard is closed at build time."""
    docs = spark.createDataFrame(
        [(1, ""), (2, "   ")], "doc_id long, text string")
    idx = str(tmp_path / "zero")
    TI.write_text_index(docs, idx, n_buckets=8)
    qs = spark.createDataFrame([(1, "anything")],
                               "query_id long, query string")
    assert TI.bm25_indexed(spark, idx, qs, k=5).count() == 0
    st = TI.text_index_stats(spark, idx)
    assert (st["n_docs"], st["n_docs_tok"], st["postings_rows"]) == (
        2, 0, 0)
    # the empty index can still GROW into a useful one
    real = _docs(spark).where(F.col("doc_id") < 50)
    TI.write_text_index(real, idx, mode="append", append_token="b1",
                        n_buckets=None)
    grown = _rows(TI.bm25_indexed(spark, idx, _queries(spark), k=5))
    assert grown
    TI.compact_text_index(spark, idx)
    assert _rows(TI.bm25_indexed(spark, idx, _queries(spark), k=5)) == \
        grown


def test_empty_and_unmatched_queries(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "empty")
    TI.write_text_index(docs, idx, n_buckets=8)
    blank = spark.createDataFrame([(1, "   ")],
                                  "query_id long, query string")
    assert TI.bm25_indexed(spark, idx, blank, k=5).count() == 0
    nohit = spark.createDataFrame([(1, "zzqq9x unmatched9z")],
                                  "query_id long, query string")
    assert TI.bm25_indexed(spark, idx, nohit, k=5).count() == 0


def test_fuzz_lifecycle_equals_built_at_once(spark, tmp_path_factory):
    """Stateful property (the r8 MinHash-index pattern): ANY sequence
    of append / retried-append / compact / crashed-compact-then-recover
    / contending-writer operations leaves the text index answering
    probes exactly like one built over all admitted docs at once —
    including the meta counters that feed N/avgdl."""
    import random
    import shutil

    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()

    @given(data=st.data())
    @settings(max_examples=3, deadline=None)
    def run(data):
        rng = random.Random(data.draw(st.integers(0, 2**32)))

        def doc():
            return " ".join(rng.choices(words, k=rng.randint(3, 12)))

        root = tmp_path_factory.mktemp("ti_lifecycle")
        idx = str(root / "idx")
        next_id = [0]

        def batch(n):
            rows = [(next_id[0] + i, doc()) for i in range(n)]
            next_id[0] += n
            return spark.createDataFrame(rows, "doc_id long, text string")

        seed = batch(rng.randint(2, 5))
        TI.write_text_index(seed, idx, n_buckets=4)
        admitted = [seed]
        for _ in range(rng.randint(2, 4)):
            op = rng.choice(["append", "retry_append", "compact",
                             "crashed_compact", "contending_writer"])
            if op == "contending_writer":
                t = D.acquire_index_lease(idx, "fuzz-hold")
                b = batch(rng.randint(1, 3))
                tok = f"t{next_id[0]}"
                try:
                    with pytest.raises(ValueError,
                                       match="live writer lease"):
                        TI.write_text_index(b, idx, mode="append",
                                            n_buckets=None,
                                            append_token=tok)
                finally:
                    assert D.release_index_lease(idx, t)
                TI.write_text_index(b, idx, mode="append",
                                    n_buckets=None, append_token=tok)
                admitted.append(b)
            elif op in ("append", "retry_append"):
                b = batch(rng.randint(1, 4))
                tok = f"t{next_id[0]}"
                TI.write_text_index(b, idx, mode="append",
                                    n_buckets=None, append_token=tok)
                if op == "retry_append":  # committed retry: no-op
                    TI.write_text_index(b, idx, mode="append",
                                        n_buckets=None, append_token=tok)
                admitted.append(b)
            elif op == "compact":
                TI.compact_text_index(spark, idx)
            else:
                # r10 crash model: the compact died BEFORE the pointer
                # flip, leaving partial next-version residue — the
                # index stays committed, and the retry overwrites it
                import os

                m = TI._read_text_meta(spark, idx)
                for t in ("postings", "termstats"):
                    nv = m["versions"].get(t, 0) + 1
                    res = f"{idx}/{t}_v{nv}"
                    os.makedirs(res, exist_ok=True)
                    with open(f"{res}/part-garbage.parquet", "wb") as fh:
                        fh.write(b"not parquet")
                assert TI._read_text_meta(spark, idx)["status"] == \
                    "committed"
                TI.compact_text_index(spark, idx)
        whole = str(root / "whole")
        ref = admitted[0]
        for b in admitted[1:]:
            ref = ref.unionByName(b)
        TI.write_text_index(ref, whole, n_buckets=4)
        qs = spark.createDataFrame(
            [(i, w) for i, w in enumerate(rng.sample(words, 5))],
            "query_id long, query string")
        assert _rows(TI.bm25_indexed(spark, idx, qs, k=10)) == _rows(
            TI.bm25_indexed(spark, whole, qs, k=10))
        mi = TI._read_text_meta(spark, idx)
        mw = TI._read_text_meta(spark, whole)
        assert (mi["n_docs"], mi["n_docs_tok"], mi["sum_dl"]) == (
            mw["n_docs"], mw["n_docs_tok"], mw["sum_dl"])

    run()


def test_null_ids_raise_loudly(spark, tmp_path):
    """NULL doc ids would merge under the probe's (term, id)
    dropDuplicates and mislabel results — the checked id contract
    raises at build time instead. NULL text is fine (tokenizes empty,
    like blank text)."""
    bad = spark.createDataFrame(
        [(1, "fine text"), (None, "null id text")],
        "doc_id long, text string")
    with pytest.raises(Exception, match="contains NULL"):
        TI.write_text_index(bad, str(tmp_path / "nid"), n_buckets=4)
    ok = spark.createDataFrame(
        [(1, "fine text"), (2, None)], "doc_id long, text string")
    idx = str(tmp_path / "ntext")
    TI.write_text_index(ok, idx, n_buckets=4)
    m = TI._read_text_meta(spark, idx)
    assert (m["n_docs"], m["n_docs_tok"]) == (2, 1)
    qs = spark.createDataFrame([(1, "fine")], "query_id long, query string")
    assert [r.doc_id for r in TI.bm25_indexed(spark, idx, qs).collect()] \
        == [1]


def test_max_df_ratio_stop_term_skip(spark, tmp_path):
    """Opt-in stop-term skip: a term whose termstats df exceeds
    ratio·N is dropped BEFORE its (corpus-proportional) postings are
    read. BM25 is additive per term, so skipping t ≡ querying without
    t — pinned as exact equality. df deltas sum across appends; a
    pre-sidecar index raises a clear error; compaction (re)builds the
    sidecar."""
    import shutil

    docs = _docs(spark).select(
        "doc_id", F.concat(F.lit("common "), F.col("text")).alias("text"))
    whole = str(tmp_path / "whole")
    TI.write_text_index(docs, whole, n_buckets=8)
    qs = spark.createDataFrame(
        [(1, "common data pipeline"), (2, "model training")],
        "query_id long, query string")
    qs_skipped = spark.createDataFrame(
        [(1, "data pipeline"), (2, "model training")],
        "query_id long, query string")
    got = _rows(TI.bm25_indexed(spark, whole, qs, k=5,
                                max_df_ratio=0.9))
    want = _rows(TI.bm25_indexed(spark, whole, qs_skipped, k=5))
    assert got == want and got
    # ratio above every df: identical to the exact probe
    assert _rows(TI.bm25_indexed(spark, whole, qs, k=5,
                                 max_df_ratio=1.1)) == _rows(
        TI.bm25_indexed(spark, whole, qs, k=5))
    # the skipped term's postings are NOT in the scan's pushdown list
    plan = TI.bm25_indexed(spark, whole, qs, k=5, max_df_ratio=0.9,
                           pushdown_min_index_bytes=0) \
        ._jdf.queryExecution().executedPlan().toString()
    in_lists = re.findall(r"In\(term, \[([^\]]*)\]", plan)
    assert in_lists and all(
        "common" not in lst.split(",") for lst in in_lists), in_lists
    # df deltas sum across appends: grown index skips identically
    grown = str(tmp_path / "grown")
    TI.write_text_index(docs.where(F.col("doc_id") % 2 == 0), grown,
                        n_buckets=8)
    TI.write_text_index(docs.where(F.col("doc_id") % 2 == 1), grown,
                        mode="append", append_token="b1", n_buckets=None)
    assert _rows(TI.bm25_indexed(spark, grown, qs, k=5,
                                 max_df_ratio=0.9)) == got
    # compaction collapses deltas to one exact row per term and the
    # skip decision is unchanged
    TI.compact_text_index(spark, grown)
    st = TI.text_index_stats(spark, grown)
    assert st["termstats_rows"] > 0
    assert _rows(TI.bm25_indexed(spark, grown, qs, k=5,
                                 max_df_ratio=0.9)) == got
    # a pre-sidecar index: clear error with max_df_ratio, exact probes
    # still fine, and compaction ADDS the sidecar
    old = str(tmp_path / "old")
    TI.write_text_index(docs, old, n_buckets=8)
    shutil.rmtree(f"{old}/termstats")
    assert _rows(TI.bm25_indexed(spark, old, qs, k=5)) == _rows(
        TI.bm25_indexed(spark, whole, qs, k=5))
    with pytest.raises(ValueError, match="termstats"):
        TI.bm25_indexed(spark, old, qs, k=5, max_df_ratio=0.9).collect()
    TI.compact_text_index(spark, old)
    assert _rows(TI.bm25_indexed(spark, old, qs, k=5,
                                 max_df_ratio=0.9)) == got
