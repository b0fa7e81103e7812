"""Stateful lifecycle fuzz for the VECTOR indexes (r9): any sequence
of append / retried-append / compact / crashed-compact-recovery /
hot-centroid split / contending-writer operations leaves the IVF and
IVF-PQ indexes answering EXHAUSTIVE probes exactly like one index
built over all admitted vectors at once. Probing with nprobe covering
every centroid (and, for IVF-PQ, rerank covering every candidate)
makes the answer independent of routing, so the invariant holds even
across splits that legitimately change the centroid matrix. Completes
the family: the MinHash/text/exact indexes carry the same fuzz in
their own test files."""

from __future__ import annotations

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import avro_spark.functions.dedup as D
import avro_spark.functions.similarity as S
from avro_spark.functions import ivfpq_index as Q


def _batch_factory(spark, rng, dim=8):
    next_id = [0]

    def batch(n):
        rows = [
            (next_id[0] + i,
             [rng.uniform(-1, 1) for _ in range(dim)])
            for i in range(n)
        ]
        next_id[0] += n
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    return batch


def _rows(df):
    return [
        (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
        for r in df.orderBy("query_id", "rank").collect()
    ]


def _fuzz(spark, tmp_path_factory, flavor):
    """Shared driver for both vector indexes; ``flavor`` picks the
    module under test."""

    @given(data=st.data())
    @settings(max_examples=2, deadline=None)
    def run(data):
        rng = random.Random(data.draw(st.integers(0, 2**32)))
        batch = _batch_factory(spark, rng)
        root = tmp_path_factory.mktemp(f"{flavor}_lifecycle")
        idx = str(root / "idx")
        seed = batch(rng.randint(8, 12))
        cents = S.sample_centroids(seed, 3)
        books = (S.pq_codebooks(seed, m=4, k=4, refine_iters=1)
                 if flavor == "ivfpq" else None)
        if flavor == "ivf":
            S.write_ivf_index(seed, cents, idx)
        else:
            Q.write_ivfpq_index(seed, cents, books, idx)
        admitted = [seed]
        for _ in range(rng.randint(2, 4)):
            op = rng.choice(["append", "retry_append", "compact",
                             "crashed_compact", "split",
                             "contending_writer"])
            if op in ("append", "retry_append", "contending_writer"):
                b = batch(rng.randint(2, 5))
                tok = f"t{len(admitted)}"
                if op == "contending_writer":
                    t = D.acquire_index_lease(idx, "fuzz-hold")
                    try:
                        with pytest.raises(ValueError,
                                           match="live writer lease"):
                            _append(flavor, b, idx, tok)
                    finally:
                        assert D.release_index_lease(idx, t)
                _append(flavor, b, idx, tok)
                if op == "retry_append":  # committed retry: no-op
                    _append(flavor, b, idx, tok)
                admitted.append(b)
            elif op == "compact":
                _compact(flavor, spark, idx)
            elif op == "crashed_compact":
                _stage_crashed_compact(flavor, spark, idx)
                # r10: a pre-flip crash never blocks probes
                assert _rows(_probe(
                    flavor, spark, idx,
                    seed.limit(1).select(
                        seed.vec_id.alias("query_id"),
                        seed.embedding.alias("q_embedding"))))
                _compact(flavor, spark, idx)  # retry overwrites residue
            else:  # split a random centroid; too-small ones refuse
                m = _meta(flavor, spark, idx)
                cid = rng.randrange(len(m["centroids"]))
                try:
                    _split(flavor, spark, idx, cid)
                except ValueError:
                    pass  # partition too small to split — legal no-op
        whole = str(root / "whole")
        ref = admitted[0]
        for b in admitted[1:]:
            ref = ref.unionByName(b)
        if flavor == "ivf":
            S.write_ivf_index(ref, cents, whole)
        else:
            Q.write_ivfpq_index(ref, cents, books, whole)
        queries = seed.limit(3).select(
            seed.vec_id.alias("query_id"),
            seed.embedding.alias("q_embedding"))
        got = _rows(_probe(flavor, spark, idx, queries))
        want = _rows(_probe(flavor, spark, whole, queries))
        assert got == want and got

    run()


def _append(flavor, b, idx, tok):
    if flavor == "ivf":
        S.write_ivf_index(b, None, idx, mode="append", append_token=tok)
    else:
        Q.write_ivfpq_index(b, None, None, idx, mode="append",
                            append_token=tok)


def _compact(flavor, spark, idx):
    if flavor == "ivf":
        S.compact_ivf_index(spark, idx)
    else:
        Q.compact_ivfpq_index(spark, idx)


def _meta(flavor, spark, idx):
    return (S._read_ivf_meta(spark, idx) if flavor == "ivf"
            else Q._read_ivfpq_meta(spark, idx))


def _split(flavor, spark, idx, cid):
    if flavor == "ivf":
        S.split_ivf_centroid(spark, idx, cid, 2, iters=1)
    else:
        Q.split_ivfpq_centroid(spark, idx, cid, 2, iters=1)


def _stage_crashed_compact(flavor, spark, idx):
    """Simulate the r10 compact crash model: the compact died BEFORE
    the meta-pointer flip, leaving a partial (garbage) next-version
    dir behind and the meta row untouched — the index must stay fully
    committed and probe-able, and the retrying compact must overwrite
    the residue. (The pre-r10 remove-then-move crash window no longer
    exists; its legacy '__compacting__' recovery is covered by the
    per-family compaction tests.)"""
    import os

    m = _meta(flavor, spark, idx)
    tables = ["data"] if flavor == "ivf" else ["codes", "raw"]
    for t in tables:
        nv = m["versions"].get(t, 0) + 1
        residue = f"{idx}/{t}_v{nv}/centroid_id=0"
        os.makedirs(residue, exist_ok=True)
        with open(f"{residue}/part-garbage.parquet", "wb") as fh:
            fh.write(b"not a parquet file")
    # the crash left NO intermediate state: still committed, probes fine
    assert _meta(flavor, spark, idx)["status"] == "committed"


def _probe(flavor, spark, idx, queries):
    """EXHAUSTIVE probe: nprobe covers every centroid (and rerank every
    candidate), so the answer is the exact top-k regardless of how
    appends/splits routed the rows."""
    if flavor == "ivf":
        return S.knn_ivf_indexed(spark, idx, queries, None, k=4,
                                 nprobe=99)
    return Q.knn_ivfpq_indexed(spark, idx, queries, k=4, nprobe=99,
                               rerank=100_000)


def test_fuzz_ivf_lifecycle_equals_built_at_once(spark, tmp_path_factory):
    _fuzz(spark, tmp_path_factory, "ivf")


def test_fuzz_ivfpq_lifecycle_equals_built_at_once(spark,
                                                   tmp_path_factory):
    _fuzz(spark, tmp_path_factory, "ivfpq")
