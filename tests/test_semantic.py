"""SemDeDup-style semantic dedup (r9): cluster-bounded pairwise cosine
with an anchored-greedy lowest-id keeper rule — verified row-for-row
against an in-memory NumPy reference and on hand-built edge shapes."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

import avro_spark.functions.similarity as S
from avro_spark.functions import semantic as SD

from conftest import SF_DIR


def _ref(ids, vecs, cents, tau):
    """NumPy reference: argmax-by-cosine assignment (ties → lowest
    cid), drop j iff ∃ i<j same-cluster with cos ≥ tau, dup_of = the
    lowest such i. Zero-norm rows: cosine 0.0 with everything."""
    ncents = []
    for c in cents:
        n = math.sqrt(sum(float(x) * float(x) for x in c))
        ncents.append([float(x) / n for x in c] if n > 0 else
                      [0.0] * len(c))
    ncents = np.asarray(ncents, dtype=np.float64)
    vv = np.asarray(vecs, dtype=np.float64)
    sims = vv @ ncents.T
    assign = np.argmax(sims, axis=1)  # first max = lowest cid
    norms = np.sqrt((vv * vv).sum(axis=1))
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    out = {}
    for pos_j, j in enumerate(order):
        dup_of = None
        for i in order[:pos_j]:
            if assign[i] != assign[j]:
                continue
            d = norms[i] * norms[j]
            cos = float(vv[i] @ vv[j]) / d if d > 0 else 0.0
            if cos >= tau:
                dup_of = ids[i]
                break  # order is ascending: first hit IS the min
        out[ids[j]] = (int(assign[j]), dup_of is None, dup_of)
    return out


def _got(df, idc="vec_id"):
    return {
        r[idc]: (r.centroid_id, r.keep, r.dup_of) for r in df.collect()
    }


def test_matches_numpy_reference_on_real_embeddings(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 4)
    got = _got(SD.semantic_dedup(emb, cents, 0.4))
    rows = emb.select("vec_id", "embedding").collect()
    want = _ref([r.vec_id for r in rows],
                [list(map(float, r.embedding)) for r in rows],
                cents, 0.4)
    assert got == want
    assert len(got) == emb.count()
    dropped = sum(1 for v in got.values() if not v[1])
    assert dropped > 0, "tau=0.4 must actually drop rows at this SF"


def test_threshold_above_max_keeps_all(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 4)
    d = SD.semantic_dedup(emb, cents, 0.999)
    assert d.where(~F.col("keep")).count() == 0


def test_chain_and_duplicate_semantics(spark):
    """A≈B≈C with A≉C: B drops (shadowed by A) and C ALSO drops
    (shadowed by B — shadowing does not require the shadow to
    survive); an exact duplicate pair keeps only the lower id; a
    cross-cluster near-dup is never compared."""
    a = [1.0, 0.0]
    b = [math.cos(0.30), math.sin(0.30)]   # cos(a,b)=cos(.30)≈.955
    c = [math.cos(0.60), math.sin(0.60)]   # cos(b,c)≈.955, cos(a,c)≈.825
    far = [-1.0, 0.05]
    rows = [(10, a), (11, b), (12, c), (13, a), (14, far)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")
    cents = [a, far]  # 10..13 cluster 0, 14 cluster 1
    got = _got(SD.semantic_dedup(df, cents, 0.9))
    assert got[10] == (0, True, None)
    assert got[11] == (0, False, 10)   # shadowed by A
    assert got[12] == (0, False, 11)   # shadowed by dropped B (chain)
    assert got[13] == (0, False, 10)   # exact duplicate of A
    assert got[14] == (1, True, None)  # alone in its cluster
    # the same near-dup pair across DIFFERENT clusters is never compared
    got2 = _got(SD.semantic_dedup(df, [a, c], 0.8))
    assert got2[12][0] != got2[10][0]
    assert got2[12][1] or got2[12][2] != 10


def test_zero_vector_always_kept(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<double>")
    got = _got(SD.semantic_dedup(df, [[1.0, 0.0]], 0.5))
    assert got[2] == (0, True, None)
    assert got[3] == (0, False, 1)


def test_string_ids_native_ordering(spark):
    """String ids order natively ('a' shadows 'b') — no silent long
    cast (the r8 id-contract lesson)."""
    df = spark.createDataFrame(
        [("b", [1.0, 0.0]), ("a", [1.0, 0.001]), ("c", [0.0, 1.0])],
        "vec_id string, embedding array<double>")
    got = _got(SD.semantic_dedup(df, [[1.0, 0.0]], 0.99))
    assert got["a"] == (0, True, None)
    assert got["b"] == (0, False, "a")
    assert got["c"] == (0, True, None)
    assert isinstance(next(iter(got)), str)


def test_keepers_face(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 4)
    kept = SD.semantic_dedup_keepers(emb, cents, 0.4)
    assert kept.columns == emb.columns
    d = SD.semantic_dedup(emb, cents, 0.4)
    assert kept.count() == d.where("keep").count() < emb.count()
    # keepers are exactly the keep=true ids
    a = {r.vec_id for r in kept.select("vec_id").collect()}
    b = {r.vec_id for r in d.where("keep").select("vec_id").collect()}
    assert a == b


def test_dedup_against_ivf_index(spark, tmp_path):
    """Incremental semantic dedup: keep iff the persisted-index top-1
    cosine < τ; a batch vector whose probed partitions hold no
    candidate keeps with a null neighbor."""
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    idx = str(tmp_path / "ivf")
    S.write_ivf_index(corpus, [[1.0, 0.0], [0.0, 1.0]], idx)
    batch = spark.createDataFrame(
        [(10, [0.999, 0.01]),   # near-dup of 1 → dropped
         (11, [0.6, -0.8])],    # novel direction → kept
        "vec_id long, embedding array<double>")
    got = {r.vec_id: (r.nn_id, r.keep)
           for r in SD.semantic_dedup_against_index(
               spark, idx, batch, 0.9, nprobe=2).collect()}
    assert got[10] == (1, False)
    assert got[11][1] is True
    # exclude_self on an index member whose partition holds only
    # itself: nprobe=1 probes its own centroid only → no candidate
    lone = corpus.where(F.col("vec_id") == 1)
    got2 = SD.semantic_dedup_against_index(
        spark, idx, lone, 0.9, nprobe=1).head()
    assert (got2.nn_id, got2.cosine, got2.keep) == (None, None, True)


def test_no_cartesian_product_in_plan(spark):
    """The pair search joins on centroid equality — Catalyst must plan
    an equi-join (hash/sort-merge), never a cartesian product."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 4)
    plan = SD.semantic_dedup(emb, cents, 0.4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan[:2000]


def test_null_ids_raise_loudly(spark, tmp_path):
    """A null-id row could never be dropped by the `<` pair predicate —
    the checked id contract raises instead of silently keeping it."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (None, [1.0, 0.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="contains NULL"):
        SD.semantic_dedup(df, [[1.0, 0.0]], 0.5).collect()
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    idx = str(tmp_path / "nivf")
    S.write_ivf_index(corpus, [[1.0, 0.0]], idx)
    with pytest.raises(Exception, match="contains NULL"):
        SD.semantic_dedup_against_index(spark, idx, df, 0.5).collect()


def test_multiprobe_catches_straddling_pair(spark):
    """r10 (VERDICT missing #3): a near-dup pair straddling a Voronoi
    boundary is invisible at nprobe=1 (each row compares only within
    its own cluster, at ANY number of clusters); nprobe=2 routes the
    higher id's pair search to its top-2 centroids and catches it.
    Pair work grows ~nprobe× (the shadowing side stays keyed by its
    primary cluster — measured here, the VERDICT's ≤2× bound), and
    nprobe=1 output is bit-identical to the pre-r10 rule (the
    oracle-checked gate shape)."""
    import math

    from pyspark.sql import functions as F

    # four centroids at ±45°/±135°; a/b hug the c1/c2 boundary from
    # opposite sides (cosine(a,b) ≈ 1); fillers pad every cluster so
    # the pair-work measurement reflects balanced routing
    def at(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    rows = [(0, at(2)), (1, at(-2))] + [
        (10 * (j + 1) + i, at(base + 3 * i))
        for j, base in enumerate([50, -50, 130, -130])
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [at(45), at(-45), at(135), at(-135)]

    d1 = {r.vec_id: (r.keep, r.dup_of)
          for r in SD.semantic_dedup(df, cents, 0.99).collect()}
    assert d1[0] == (True, None) and d1[1] == (True, None)  # missed

    d2 = {r.vec_id: (r.keep, r.dup_of)
          for r in SD.semantic_dedup(df, cents, 0.99, nprobe=2).collect()}
    assert d2[0] == (True, None)
    assert d2[1] == (False, 0)          # caught: shadowed by id 0

    # keeper rule + schema unchanged; every other row unaffected
    assert set(d2) == set(d1)
    for k in d1:
        if k != 1:
            assert d2[k] == d1[k]

    # measured pair work: the cluster-keyed join's VOLUME (rows the
    # executor scores — the `lo < hi` cut is a post-join filter) grows
    # ≤ 2× at nprobe=2: the hi side explodes to 2 rows per input row,
    # the lo side stays primary-keyed — never the nprobe²× a
    # both-sides-exploded join would cost
    def join_volume(nprobe):
        from avro_spark.functions.dedup import _native_id
        from avro_spark.functions.similarity import (
            _argmax_centroid, as_double)

        primary = _argmax_centroid(F.col("embedding"), cents)
        a = df.select(
            _native_id("vec_id").alias("vec_id"),
            primary.alias("centroid_id"),
            (SD._probe_positions(as_double(F.col("embedding")), cents,
                                 nprobe)
             if nprobe > 1 else F.array(primary)).alias("_probes"),
        )
        lo = a.select(F.col("centroid_id").alias("_c"))
        hi = a.select(F.explode("_probes").alias("_c"))
        return lo.join(hi, "_c").count()

    w1, w2 = join_volume(1), join_volume(2)
    assert w2 > w1
    assert w2 <= 2 * w1, (w1, w2)


def test_streaming_semantic_sink_exactly_once(spark, tmp_path):
    """r10: the streaming face of incremental semantic dedup — replay
    of a recorded batch skips; replay after losing the registry reuses
    the committed decisions (the append token proves the batch's own
    vectors are already IN the index, so re-probing would mark every
    admitted vector a near-dup of itself); within-batch ε-ball twins
    admit only the lowest id; a crash mid-append heals on the
    same-token retry."""
    import math
    import shutil

    from pyspark.sql import functions as F

    def at(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    corpus = spark.createDataFrame(
        [(i, at(4.0 * i)) for i in range(20)],
        "vec_id long, embedding array<double>")
    cents = S.kmeans_centroids(corpus, 4, iters=2)
    idx = str(tmp_path / "ss_idx")
    dec = str(tmp_path / "ss_dec")
    S.write_ivf_index(corpus, cents, idx)
    # batch: 9001 ≈ corpus vector 5 (near-dup), 9002 novel direction,
    # 9003 a within-batch twin of 9002
    batch = spark.createDataFrame(
        [(9001, at(20.1)), (9002, at(201.0)), (9003, at(201.05))],
        "vec_id long, embedding array<double>")
    sink = SD._stream_semantic_sink(idx, dec, threshold=0.999,
                                    admit="novel", nprobe=4)
    sink(batch, 0)
    m1 = S._read_ivf_meta(spark, idx)
    d1 = {r.vec_id: (r.nn_id, r.keep)
          for r in spark.read.parquet(f"{dec}/batch=0").collect()}
    # within-batch twin 9003 never reaches decisions (9002 won)
    assert set(d1) == {9001, 9002}
    assert d1[9001][1] is False and d1[9001][0] == 5
    assert d1[9002] == (None, True) or d1[9002][1] is True
    assert m1["rows"] == 20 + 1          # only 9002 admitted
    assert m1["token"] == "batch0"
    sink(batch, 0)                       # registry skip
    assert S._read_ivf_meta(spark, idx) == m1
    shutil.rmtree(f"{idx}/batches")
    sink(batch, 0)                       # replay: token no-op, reuse
    assert S._read_ivf_meta(spark, idx)["rows"] == m1["rows"]
    assert {r.vec_id: (r.nn_id, r.keep)
            for r in spark.read.parquet(f"{dec}/batch=0").collect()} == d1
    # the admitted vector is probe-visible to the NEXT batch
    b1 = spark.createDataFrame([(9100, at(201.02))],
                               "vec_id long, embedding array<double>")
    sink(b1, 1)
    d2 = {r.vec_id: (r.nn_id, r.keep)
          for r in spark.read.parquet(f"{dec}/batch=1").collect()}
    assert d2[9100][1] is False and d2[9100][0] == 9002
