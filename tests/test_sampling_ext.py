"""Stratified sampling, per-group caps (functions/sampling.py) and BPE
merge training (functions/retrieval.py bpe_train) — the round-2
training-data curation additions."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from avro_spark.functions.dedup import portable_hash60
from avro_spark.functions.retrieval import bpe_train
from avro_spark.functions.sampling import cap_per_group, stratified_sample

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


def test_stratified_sample_deterministic(docs):
    a = stratified_sample(docs, "source", "doc_id", 0.3)
    b = stratified_sample(docs, "source", "doc_id", 0.3)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_stratified_sample_subset_property(docs):
    # a smaller fraction must select a SUBSET of a larger one (buckets
    # are fixed per row; only the threshold moves)
    small = {r["doc_id"] for r in stratified_sample(docs, "source", "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in stratified_sample(docs, "source", "doc_id", 0.5).collect()}
    assert small <= big


def test_stratified_sample_per_stratum_fractions(docs):
    srcs = [r["source"] for r in docs.select("source").distinct().collect()]
    fr = {srcs[0]: 1.0}
    got = stratified_sample(docs, "source", "doc_id", fr, default_fraction=0.0)
    got_counts = Counter(r["source"] for r in got.collect())
    all_counts = Counter(r["source"] for r in docs.collect())
    assert got_counts[srcs[0]] == all_counts[srcs[0]]
    assert set(got_counts) == {srcs[0]}


def test_stratified_sample_rate_close(docs):
    n_all = docs.count()
    n = stratified_sample(docs, "source", "doc_id", 0.25).count()
    assert abs(n / n_all - 0.25) < 0.08  # hash-uniformity at 500 rows


def test_stratified_sample_portable_hash_matches_oracle(docs):
    import duckdb

    got = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs, "source", "doc_id", 0.25, hash_fn=portable_hash60
        ).collect()
    )
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            f"""
            SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                  % 10000 < 2500
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert got == want


def test_cap_per_group(docs):
    capped = cap_per_group(docs, "source", "doc_id", 5)
    counts = Counter(r["source"] for r in capped.collect())
    assert all(n <= 5 for n in counts.values())
    # kept rows are the 5 SMALLEST doc_ids per source
    for src, n in counts.items():
        all_ids = sorted(
            r["doc_id"] for r in docs.where(F.col("source") == src).collect()
        )
        kept = sorted(
            r["doc_id"]
            for r in capped.where(F.col("source") == src).collect()
        )
        assert kept == all_ids[: len(kept)]


def test_cap_per_group_keep_rank(docs):
    got = cap_per_group(docs, "source", "doc_id", 3, keep_rank=True)
    assert "rank" in got.columns
    assert got.where(F.col("rank") > 3).count() == 0


def _reference_bpe(texts: list[str], num_merges: int):
    """Pure-Python BPE over whitespace tokens, leftmost-first
    non-overlapping merges, (count desc, left, right) tie-break."""
    seqs = [t.lower().split() for t in texts]
    merges = []
    for step in range(num_merges):
        counts: Counter = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += 1
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, n))
        joined = left + right
        new_seqs = []
        for s in seqs:
            out: list[str] = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = joined
                else:
                    out.append(x)
            new_seqs.append(out)
        seqs = new_seqs
    return merges, seqs


def test_bpe_train_matches_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a cat and a rat sat",
        "the the the cat cat",
        "on a mat sat a cat",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    merges_df, toks_df = bpe_train(docs, num_merges=6)
    want_merges, want_seqs = _reference_bpe(texts, 6)
    got_merges = [
        (r["step"], r["left"], r["right"], r["n_pairs"])
        for r in merges_df.orderBy("step").collect()
    ]
    assert got_merges == want_merges
    got_seqs = sorted(tuple(r["t"]) for r in toks_df.collect())
    assert got_seqs == sorted(tuple(s) for s in want_seqs)


def test_bpe_train_overlapping_run(spark):
    # 'a a a a' under merge (a,a) must become [aa, aa], not [aa, a, a]
    docs = spark.createDataFrame([("a a a a",), ("a a a",)], "text string")
    merges_df, toks_df = bpe_train(docs, num_merges=1)
    m = merges_df.collect()[0]
    assert (m["left"], m["right"], m["n_pairs"]) == ("a", "a", 5)
    got = sorted(tuple(r["t"]) for r in toks_df.collect())
    assert got == [("aa", "a"), ("aa", "aa")]


def test_bpe_train_on_corpus_smoke(docs):
    merges_df, _ = bpe_train(docs.limit(50), num_merges=3)
    rows = merges_df.orderBy("step").collect()
    assert len(rows) == 3
    # counts must be non-increasing across steps
    ns = [r["n_pairs"] for r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_bpe_apply_reproduces_training_tokens(spark):
    texts = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a cat and a rat sat",
        "the the the cat cat",
        "on a mat sat a cat",
    ]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    merges_df, toks_df = bpe_train(docs, num_merges=6)
    from avro_spark.functions.retrieval import bpe_apply

    applied = sorted(
        tuple(r["tokens"]) for r in bpe_apply(docs, merges_df).collect()
    )
    trained = sorted(tuple(r["t"]) for r in toks_df.collect())
    assert applied == trained


def test_bpe_apply_list_rules_and_null(spark):
    from avro_spark.functions.retrieval import bpe_apply

    docs = spark.createDataFrame([(1, "a b c"), (2, None)], "id long, text string")
    got = {r["id"]: r["tokens"] for r in bpe_apply(docs, [("a", "b"), ("ab", "c")]).collect()}
    assert got[1] == ["abc"]
    assert got[2] is None


def test_temperature_mix_upweights_small_domains(spark):
    rows = [(i, "big") for i in range(1000)] + [(10000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    from avro_spark.functions.sampling import temperature_mix

    out = temperature_mix(df, "domain", "doc_id", alpha=0.5)
    got = Counter(r["domain"] for r in out.collect())
    # alpha=0.5: small domain kept whole-ish relative share rises from
    # 1% to ~9% (sqrt weighting)
    assert got["small"] == 10  # small domain kept at rate 1
    assert got["big"] < 1000  # big domain downsampled
    small_share = got["small"] / (got["small"] + got["big"])
    assert small_share > 0.05


def test_temperature_mix_alpha1_keeps_everything(spark):
    rows = [(i, "a") for i in range(100)] + [(1000 + i, "b") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    from avro_spark.functions.sampling import temperature_mix

    # alpha=1 → proportional sampling → default target keeps all rows
    out = temperature_mix(df, "domain", "doc_id", alpha=1.0)
    assert out.count() == 150


def test_temperature_mix_superset_property(spark):
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    from avro_spark.functions.sampling import temperature_mix

    small = {r["doc_id"] for r in temperature_mix(df, "domain", "doc_id", 0.5, target_rows=60).collect()}
    big = {r["doc_id"] for r in temperature_mix(df, "domain", "doc_id", 0.5, target_rows=200).collect()}
    assert small <= big


def test_temperature_mix_null_domain(spark):
    from avro_spark.functions.sampling import temperature_mix

    rows = [(i, "a") for i in range(50)] + [(100 + i, None) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = temperature_mix(df, "domain", "doc_id", alpha=1.0)
    got = Counter(("null" if r["domain"] is None else r["domain"]) for r in out.collect())
    # alpha=1 with equal counts keeps everything, incl. the NULL stratum
    assert got["null"] == 50 and got["a"] == 50


def test_bpe_apply_unicode_whitespace_parity(spark):
    # U+00A0 is whitespace to Python .split() but NOT to the JVM \s+
    # tokenizer bpe_train uses — apply must reproduce train exactly
    from avro_spark.functions.retrieval import bpe_apply

    texts = ["a b a b c", "a b x"]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    merges_df, toks_df = bpe_train(docs, num_merges=2)
    applied = sorted(tuple(r["tokens"]) for r in bpe_apply(docs, merges_df).collect())
    trained = sorted(tuple(r["t"]) for r in toks_df.collect())
    assert applied == trained


# ------------------------------------------------- r3: batched BPE rounds
def _merge_rows(df):
    return [(r.step, r.left, r.right, r.n_pairs)
            for r in df.orderBy("step").collect()]


def _tok_rows(df):
    return sorted(tuple(r.t) for r in df.collect())


def test_bpe_batched_equals_sequential(spark):
    """batch_size>1 must reproduce the one-merge-per-round trajectory
    merge-for-merge (rule, order, AND count), including the adversarial
    shapes: shared raw tokens, merged-token collisions like (a,b) vs
    (ab,c), and count ties."""
    corpora = [
        # interacting chain + independent pair
        ["x y z"] * 10 + ["u v"] * 6,
        # merged-token collision: 'ab' exists both raw and as a merge
        ["a b c"] * 5 + ["ab c"] * 8 + ["a b d"] * 2,
        # ties everywhere
        ["p q", "q p", "p q", "q p", "r s", "s r", "r s"],
        # long run (overlap semantics) + batchable tail
        ["m m m m m", "k l", "k l", "n o"],
    ]
    for i, texts in enumerate(corpora):
        docs = spark.createDataFrame([(t,) for t in texts], "text string")
        m1, t1 = bpe_train(docs, num_merges=6, batch_size=1)
        m8, t8 = bpe_train(docs, num_merges=6, batch_size=8)
        assert _merge_rows(m1) == _merge_rows(m8), f"corpus {i}"
        assert _tok_rows(t1) == _tok_rows(t8), f"corpus {i}"


def test_bpe_batched_fewer_driver_rounds(spark):
    """The batched path must spend strictly fewer driver round-trips:
    count collect() calls for 8 merges — sequential needs 8 count+top
    rounds, batched must finish in well under half."""
    from unittest import mock

    # 12 token-disjoint pairs with strictly distinct counts — the shape
    # batching exists for (a real corpus's head is dominated by
    # unrelated frequent bigrams)
    texts = [f"a{k} b{k}" for k in range(12) for _ in range(30 - k)]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    # patch the CONCRETE DataFrame class (pyspark 4 routes collect through
    # pyspark.sql.classic.dataframe.DataFrame, not the abstract base)
    _DF = type(docs)
    counts = {}
    real_collect = _DF.collect
    for bs in (1, 8):
        with mock.patch.object(
            _DF, "collect", autospec=True,
            side_effect=lambda self: real_collect(self),
        ) as mc:
            bpe_train(docs, num_merges=8, batch_size=bs)
            counts[bs] = mc.call_count
    assert counts[1] >= 8
    assert counts[8] <= max(counts[1] // 2, 2), counts


def test_bpe_batched_boosted_pair_counterexample(spark):
    """Review counterexample: merging (a,b) when 'ab' also exists RAW
    boosts the below-boundary pair (x,ab) above other accepted pairs —
    sequential merges (x,ab) second; a naive batch would merge (c,d)
    second. The 4x-boundary rule must keep the two paths identical."""
    texts = ["x a b"] * 60 + ["a b"] * 40 + ["x ab"] * 70 + ["c d"] * 81
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    m1, t1 = bpe_train(docs, num_merges=3, batch_size=1)
    m8, t8 = bpe_train(docs, num_merges=3, batch_size=8)
    assert _merge_rows(m1) == _merge_rows(m8)
    assert _tok_rows(t1) == _tok_rows(t8)
    # sequential picks the boosted pair second
    assert [(r[1], r[2]) for r in _merge_rows(m1)] == [
        ("a", "b"), ("x", "ab"), ("c", "d")]
