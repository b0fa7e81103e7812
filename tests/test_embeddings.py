"""Embedding operators (functions/embeddings.py): normalization,
mean pooling vs numpy, int8 quantization round-trip bounds."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from avro_spark.functions import embeddings as E

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    # unpersist on teardown: a cached bare-scan plan would otherwise be
    # substituted (InMemoryRelation) into OTHER modules' plans of the
    # same file and break their PushedFilters assertions
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def local(emb):
    return [
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64), r["label"])
        for r in emb.collect()
    ]


def test_l2_normalize_unit_norm(emb):
    got = emb.select(
        "vec_id", E.l2_normalize(F.col("embedding")).alias("n")
    ).collect()
    for r in got:
        norm = math.sqrt(sum(x * x for x in r["n"]))
        assert norm == pytest.approx(1.0, rel=1e-9)


def test_l2_normalize_zero_vector(spark):
    df = spark.createDataFrame([([0.0, 0.0],)], "embedding array<float>")
    got = df.select(E.l2_normalize(F.col("embedding")).alias("n")).collect()
    assert got[0]["n"] == [0.0, 0.0]


def test_mean_pool_matches_numpy(emb, local):
    got = {r["label"]: r for r in E.mean_pool(emb, "label").collect()}
    by_label: dict[int, list] = {}
    for _, v, lbl in local:
        by_label.setdefault(lbl, []).append(v)
    assert set(got) == set(by_label)
    for lbl, vecs in by_label.items():
        want = np.mean(np.stack(vecs), axis=0)
        assert got[lbl]["n_vecs"] == len(vecs)
        assert np.allclose(np.array(got[lbl]["pooled"]), want, rtol=1e-9)


def test_mean_pool_no_vector_collect_list(emb):
    # the plan must aggregate scalar components, never collect whole
    # vectors into a per-group list
    plan = (
        E.mean_pool(emb, "label")._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "collect_list(_pos" in plan.replace(" ", "") or "collect_list" in plan
    assert "collect_list(embedding" not in plan.replace(" ", "")


def test_quantize_roundtrip_bound(emb, local):
    got = emb.select(
        "vec_id",
        F.col("embedding").alias("orig"),
        E.dequantize_int8(E.quantize_int8(F.col("embedding"))).alias("deq"),
    ).collect()
    for r in got:
        orig = np.array(r["orig"], dtype=np.float64)
        deq = np.array(r["deq"])
        scale = np.abs(orig).max()
        assert np.abs(orig - deq).max() <= scale / 254 + 1e-12


def test_quantize_codes_in_range(emb):
    got = emb.select(E.quantize_int8(F.col("embedding")).alias("s")).collect()
    for r in got:
        assert all(-127 <= q <= 127 for q in r["s"]["q"])


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([([0.0, 0.0, 0.0],)], "embedding array<float>")
    r = df.select(E.quantize_int8(F.col("embedding")).alias("s")).collect()[0]
    assert r["s"]["scale"] == 0.0 and r["s"]["q"] == [0, 0, 0]


def test_quantize_preserves_cosine(emb, local):
    # int8 quantization must keep cosine similarity within ~1%
    import itertools

    got = {
        r["vec_id"]: np.array(r["deq"])
        for r in emb.select(
            "vec_id",
            E.dequantize_int8(E.quantize_int8(F.col("embedding"))).alias("deq"),
        ).collect()
    }
    orig = {vid: v for vid, v, _ in local}
    ids = sorted(orig)[:10]
    for a, b in itertools.combinations(ids, 2):
        def cos(u, v):
            return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))

        assert cos(orig[a], orig[b]) == pytest.approx(
            cos(got[a], got[b]), abs=0.02
        )


def test_mean_pool_ragged_vectors(spark):
    # shorter vectors don't contribute to tail positions; n_vecs counts
    # non-empty vectors (documented ragged semantics, matched by the
    # embedding_pool oracle)
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0]), (1, [])],
        "label int, embedding array<double>",
    )
    got = E.mean_pool(df, "label").collect()[0]
    assert got["n_vecs"] == 2
    assert got["pooled"] == [2.0, 2.0]  # pos0 avg(1,3); pos1 avg(2)


def test_l2_normalize_is_let_bound(emb):
    # the norm fold must appear ONCE in the plan, not once per component
    plan = (
        emb.select(E.l2_normalize(F.col("embedding")))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("aggregate(") <= 2  # norm fold + nothing per-element


def test_quantize_codes_are_tinyint(emb):
    out = emb.select(E.quantize_int8(F.col("embedding")).alias("s"))
    assert "array<tinyint>" in out.schema["s"].dataType.simpleString()


def test_decontaminate_arrow_engine_matches_hof(spark):
    """The vectorized Arrow (numpy matmul) engine must agree with the
    sequential HOF engine on pair membership and cosines (to well past
    the 6dp the gates round to — BLAS pairwise summation only moves the
    last ulp)."""
    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    train = emb.where(F.col("vec_id") < 400)
    ev = emb.where(F.col("vec_id") >= 400).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("e_embedding"),
    )
    hof = {
        (r.vec_id, r.eval_id): r.cosine
        for r in S.decontaminate_embeddings(train, ev, threshold=0.3).collect()
    }
    arw = {
        (r.vec_id, r.eval_id): r.cosine
        for r in S.decontaminate_embeddings(
            train, ev, threshold=0.3, engine="arrow"
        ).collect()
    }
    assert set(hof) == set(arw)
    assert hof, "threshold 0.3 must keep some pairs on this data"
    for k in hof:
        assert abs(hof[k] - arw[k]) < 1e-9, k


def test_decontaminate_arrow_empty_eval(spark):
    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ev = emb.where(F.lit(False)).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("e_embedding"),
    )
    out = S.decontaminate_embeddings(emb, ev, threshold=0.0, engine="arrow")
    assert out.count() == 0


def test_knn_bruteforce_arrow_engine_matches_hof(spark):
    """engine='arrow' must return the same (query, rank, vec) triples as
    the HOF engine — the batch-local top-k uses the identical
    (cosine desc, id asc) order, so the global set is unchanged."""
    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    for exclude in (True, False):
        hof = [
            (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
            for r in S.knn_bruteforce(emb, q, k=7, exclude_self=exclude)
            .orderBy("query_id", "rank").collect()
        ]
        arw = [
            (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
            for r in S.knn_bruteforce(
                emb, q, k=7, exclude_self=exclude, engine="arrow")
            .orderBy("query_id", "rank").collect()
        ]
        assert hof == arw, exclude


def test_knn_bruteforce_arrow_empty_queries(spark):
    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.lit(False)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    assert S.knn_bruteforce(emb, q, k=3, engine="arrow").count() == 0


def test_arrow_engines_accept_string_and_int32_ids(spark):
    """The hof engines take any id type; the arrow engines must too —
    they previously hardcoded int64 output ids and crashed on
    string/int32 id columns (ValueError/ArrowInvalid)."""
    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(64)
    for cast_t in ("string", "int"):
        ids = emb.select(
            F.col("vec_id").cast(cast_t).alias("vec_id"), "embedding"
        )
        q = ids.limit(3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        )
        hof = [
            (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
            for r in S.knn_bruteforce(ids, q, k=4)
            .orderBy("query_id", "rank").collect()
        ]
        arw = [
            (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
            for r in S.knn_bruteforce(ids, q, k=4, engine="arrow")
            .orderBy("query_id", "rank").collect()
        ]
        assert hof == arw, cast_t

        ev = ids.limit(5).select(
            F.col("vec_id").alias("eval_id"),
            F.col("embedding").alias("e_embedding"),
        )
        hof_p = {
            (r.vec_id, r.eval_id): round(r.cosine, 9)
            for r in S.decontaminate_embeddings(ids, ev, threshold=0.9).collect()
        }
        arw_p = {
            (r.vec_id, r.eval_id): round(r.cosine, 9)
            for r in S.decontaminate_embeddings(
                ids, ev, threshold=0.9, engine="arrow"
            ).collect()
        }
        assert hof_p == arw_p, cast_t
        # schema parity: output id types must match the inputs'
        out_arw = S.decontaminate_embeddings(
            ids, ev, threshold=0.9, engine="arrow")
        assert (
            out_arw.schema["vec_id"].dataType
            == ids.schema["vec_id"].dataType
        )


def test_ivf_index_partition_pruning_matches_knn_ivf(spark, tmp_path):
    """write_ivf_index + knn_ivf_indexed: identical results to the
    scan-everything knn_ivf, and the index scan is PARTITION-PRUNED —
    the physical plan's PartitionFilters carries the probed centroid
    set, so only ~nprobe/k of the index files are listed/read."""
    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 16)
    q = emb.where(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    path = str(tmp_path / "ivf_index")
    S.write_ivf_index(emb, cents, path)
    want = [
        (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
        for r in S.knn_ivf(emb, q, cents, k=5, nprobe=3)
        .orderBy("query_id", "rank").collect()
    ]
    # centroids=None: the probe reads the pinned matrix from meta; the
    # explicit-list form is verified (and refused on drift) elsewhere
    out = S.knn_ivf_indexed(spark, path, q, None, k=5, nprobe=3,
                            prune_min_index_bytes=0)
    got = [
        (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
        for r in out.orderBy("query_id", "rank").collect()
    ]
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the probe filter must reach the scan as a PARTITION filter (the
    # FileScan metadata string truncates its contents, so check the
    # optimized plan for the IN-filter on the partition column instead)
    assert "PartitionFilters: [" in plan
    # and the filter really lands in PartitionFilters (not DataFilters):
    # a short single-bucket predicate renders untruncated in the FileScan
    # metadata, unlike the main query's IN-set
    p1 = (
        spark.read.parquet(path + "/data")
        .where(F.col("centroid_id") == 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", p1)
    assert m and "centroid_id" in m.group(1) and "3" in m.group(1), p1[:1500]
    # r11 size-adaptive default: a tiny index (below one scan task)
    # skips the probe-set collect and partition prune — no IN-set in
    # PartitionFilters, IDENTICAL rows
    adaptive = S.knn_ivf_indexed(spark, path, q, None, k=5, nprobe=3)
    got_a = [
        (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
        for r in adaptive.orderBy("query_id", "rank").collect()
    ]
    assert got_a == want
    aplan = adaptive._jdf.queryExecution().executedPlan().toString()
    ma = re.search(r"PartitionFilters: \[([^\]]*)\]", aplan)
    assert ma is None or "IN" not in ma.group(1).upper(), aplan[:1500]


def test_ivf_index_pins_its_centroids(spark, tmp_path):
    """r8 (VERDICT #1): the persisted IVF index stores the centroid
    matrix it was built with; a probe with retrained/drifted centroids
    raises LOUDLY instead of pruning the wrong partitions and silently
    returning low-recall neighbors (mirror of
    test_dead_rebuild_probes_loudly for the ANN sibling)."""
    import pytest

    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 8)
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    path = str(tmp_path / "pinned")
    S.write_ivf_index(emb, cents, path)
    # matching explicit list: accepted (back-compat call shape)
    assert S.knn_ivf_indexed(spark, path, q, cents, k=3, nprobe=2).count()
    # drifted list: refused
    drifted = [[x + 0.25 for x in c] for c in cents]
    with pytest.raises(ValueError, match="do not match the matrix"):
        S.knn_ivf_indexed(spark, path, q, drifted, k=3, nprobe=2)
    # a rebuild that died between its '__building__' marker and commit:
    # probes refuse
    S._write_ivf_meta(spark, path, cents, "__building__", 0)
    with pytest.raises(ValueError, match="died part-way"):
        S.knn_ivf_indexed(spark, path, q, None, k=3, nprobe=2)
    # an old-layout / non-index path: diagnosable, not an obscure
    # parquet error
    with pytest.raises(ValueError, match="no IVF index meta"):
        S.knn_ivf_indexed(spark, str(tmp_path / "nothing"), q, None)


def test_ivf_index_append_grows_equivalently(spark, tmp_path):
    """r8: mode='append' grows the index to exactly the
    built-at-once result; drifted append centroids are refused;
    centroids=None reuses the stored matrix."""
    import pytest

    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 8)
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    whole, grown = str(tmp_path / "whole"), str(tmp_path / "grown")
    S.write_ivf_index(emb, cents, whole)
    S.write_ivf_index(emb.where("vec_id % 2 = 0"), cents, grown)
    S.write_ivf_index(emb.where("vec_id % 2 = 1"), None, grown,
                      mode="append")
    def topk(p):
        return [
            (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
            for r in S.knn_ivf_indexed(spark, p, q, None, k=5, nprobe=3)
            .orderBy("query_id", "rank").collect()
        ]
    assert topk(grown) == topk(whole)
    drifted = [[x + 1.0 for x in c] for c in cents]
    with pytest.raises(ValueError, match="append centroids do not match"):
        S.write_ivf_index(emb, drifted, grown, mode="append")
    with pytest.raises(ValueError, match="bad mode"):
        S.write_ivf_index(emb, cents, grown, mode="errorifexists")


def test_ivf_index_append_retry_never_double_appends(spark, tmp_path):
    """r8: an append whose data job committed but whose meta commit
    crashed is healed by re-running the SAME append — the retry detects
    the landed data (footer count vs meta rows) and only commits the
    meta row, so rows are never duplicated. A probe mid-crash refuses."""
    import pytest

    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 8)
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    idx = str(tmp_path / "retry")
    base = emb.where("vec_id % 2 = 0")
    batch = emb.where("vec_id % 2 = 1")
    S.write_ivf_index(base, cents, idx)
    base_rows = spark.read.parquet(idx + "/data").count()
    # simulate the crash window: append's data landed, meta commit didn't
    S._write_ivf_meta(spark, idx, cents, "__appending__", base_rows)
    S.write_ivf_index(batch, None, idx, mode="append")
    spark.read.parquet(idx + "/data").count()  # plan-side sanity
    # first "retry": completes the append normally (data really appends)
    n1 = spark.read.parquet(idx + "/data").count()
    assert n1 == emb.count()
    # now simulate the other crash flavor — data landed, commit lost —
    # and retry: must NOT double-append
    S._write_ivf_meta(spark, idx, cents, "__appending__", base_rows)
    S.write_ivf_index(batch, None, idx, mode="append")
    assert spark.read.parquet(idx + "/data").count() == n1
    assert S._read_ivf_meta(spark, idx)["status"] == "committed"
    with pytest.raises(ValueError, match="died part-way"):
        S._write_ivf_meta(spark, idx, cents, "__appending__", 0)
        S.knn_ivf_indexed(spark, idx, q, None, k=3)
    # heal for good measure
    S._write_ivf_meta(spark, idx, cents, "committed", n1)
    assert S.knn_ivf_indexed(spark, idx, q, None, k=3).count()


def test_ivf_index_compaction(spark, tmp_path):
    """r8: compact_ivf_index collapses append-accumulated small files to
    ~one per centroid partition, drops retry duplicates, and preserves
    probe answers; a crash mid-swap heals by re-running (marker lands
    only after the compacted copy committed); probes refuse meanwhile."""
    import glob
    import shutil

    import pytest

    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 8)
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    idx = str(tmp_path / "civf")
    S.write_ivf_index(emb.where("vec_id % 3 = 0"), cents, idx)
    S.write_ivf_index(emb.where("vec_id % 3 = 1"), None, idx, mode="append")
    S.write_ivf_index(emb.where("vec_id % 3 = 2"), None, idx, mode="append")

    def topk():
        return [
            (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
            for r in S.knn_ivf_indexed(spark, idx, q, None, k=5, nprobe=3)
            .orderBy("query_id", "rank").collect()
        ]
    want = topk()
    n_before = len(glob.glob(idx + "/data/centroid_id=*/*.parquet"))
    S.compact_ivf_index(spark, idx)
    assert topk() == want
    # r10: the compacted table lives at data_v1 (one meta-pointer flip,
    # no remove-then-move); the old base dir is garbage-collected
    m = S._read_ivf_meta(spark, idx)
    assert m["versions"] == {"data": 1}
    import os

    assert not os.path.isdir(idx + "/data")
    data_dir = S._ivf_data_dir(idx, m)
    n_after = len(glob.glob(data_dir + "/centroid_id=*/*.parquet"))
    assert n_after < n_before
    # at most one file per centroid partition after compaction
    import collections

    per_dir = collections.Counter(
        os.path.dirname(f)
        for f in glob.glob(data_dir + "/centroid_id=*/*.parquet"))
    assert max(per_dir.values()) == 1
    assert m["status"] == "committed"
    assert m["rows"] == spark.read.parquet(data_dir).count()
    # LEGACY crash mid-swap (pre-r10 index state): compacted copy
    # committed + marker landed + main dir deleted — probe refuses,
    # re-running compaction heals via the legacy finish-the-swap
    shutil.copytree(data_dir, idx + "/data_compact")
    S._write_ivf_meta(spark, idx, cents, "__compacting__", m["rows"])
    shutil.rmtree(data_dir)
    with pytest.raises(ValueError, match="died part-way"):
        S.knn_ivf_indexed(spark, idx, q, None, k=3)
    S.compact_ivf_index(spark, idx)
    assert topk() == want
    # compaction refuses while an append is in flight
    S._write_ivf_meta(spark, idx, cents, "__appending__", m["rows"])
    with pytest.raises(ValueError, match="finish the in-flight"):
        S.compact_ivf_index(spark, idx)


def test_ivf_index_stats(spark, tmp_path):
    """r8: ivf_index_stats reports append-driven per-partition file
    growth; compaction collapses it to 1 and zeroes retry residue."""
    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 8)
    idx = str(tmp_path / "sivf")
    S.write_ivf_index(emb.where("vec_id % 2 = 0"), cents, idx)
    S.write_ivf_index(emb.where("vec_id % 2 = 1"), None, idx,
                      mode="append")
    s = S.ivf_index_stats(spark, idx)
    assert s["status"] == "committed" and s["n_centroids"] == 8
    assert s["rows"] == emb.count() == s["footer_rows"]
    assert s["max_files_per_partition"] >= 2  # build + append
    assert s["duplicate_rows"] == 0
    S.compact_ivf_index(spark, idx)
    s2 = S.ivf_index_stats(spark, idx)
    assert s2["max_files_per_partition"] == 1
    assert s2["footer_rows"] == s["footer_rows"]


def test_stream_ivf_index_exactly_once(spark, tmp_path):
    """r8: index_vectors_stream appends each micro-batch exactly once —
    a recorded batch is a no-op on replay, and the harder crash window
    (append COMMITTED, batch-id record lost) is closed by the append
    token in the meta row: blindly re-running the batch never
    double-appends. End state equals a built-at-once index."""
    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 8)
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    idx = str(tmp_path / "strivf")
    seed = emb.where("vec_id % 3 = 0")
    S.write_ivf_index(seed, cents, idx)

    # streaming drive: one availableNow drain of a parquet source
    src = str(tmp_path / "vsrc")
    emb.where("vec_id % 3 = 1").write.parquet(src)
    q1 = S.index_vectors_stream(
        spark.readStream.schema(emb.schema).parquet(src),
        idx, str(tmp_path / "ckpt"), trigger_available_now=True)
    q1.awaitTermination()
    n_after_stream = spark.read.parquet(idx + "/data").count()
    assert n_after_stream == seed.count() + emb.where("vec_id % 3 = 1").count()

    sink = S._stream_ivf_sink(idx)
    b2 = emb.where("vec_id % 3 = 2")
    sink(b2, 77)
    n1 = spark.read.parquet(idx + "/data").count()
    assert n1 == emb.count()
    sink(b2, 77)  # replay of a RECORDED batch: no-op
    assert spark.read.parquet(idx + "/data").count() == n1
    # the harder window: append committed (token in meta) but the
    # registry row was lost — delete it and replay
    import shutil

    shutil.rmtree(idx + "/batches")
    sink(b2, 77)
    assert spark.read.parquet(idx + "/data").count() == n1, \
        "token check must absorb the re-append"
    assert 77 in {r[0] for r in
                  spark.read.parquet(idx + "/batches").collect()}
    # equivalence with built-at-once
    whole = str(tmp_path / "whole_ivf")
    S.write_ivf_index(emb, cents, whole)

    def topk(p):
        return [
            (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
            for r in S.knn_ivf_indexed(spark, p, q, None, k=5, nprobe=3)
            .orderBy("query_id", "rank").collect()
        ]
    assert topk(idx) == topk(whole)
    # compaction preserves the token (a post-compaction retry of the
    # last batch is still a no-op); data now lives in the v1 dir
    S.compact_ivf_index(spark, idx)
    S.write_ivf_index(b2, None, idx, mode="append", append_token="batch77")
    data_dir = S._ivf_data_dir(idx, S._read_ivf_meta(spark, idx))
    assert spark.read.parquet(data_dir).count() == n1


def test_ivf_append_pending_token_verified(spark, tmp_path):
    """r9 (ADVICE low): the '__appending__' marker records the in-flight
    append's token, so a retry carrying a DIFFERENT token is refused
    loudly instead of silently adopting the dead attempt's data as its
    own; appends against a '__compacting__' index are refused too."""
    import pytest

    import avro_spark.functions.similarity as S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = S.sample_centroids(emb, 8)
    idx = str(tmp_path / "pend")
    base = emb.where("vec_id % 2 = 0")
    batch = emb.where("vec_id % 2 = 1")
    S.write_ivf_index(base, cents, idx)
    base_rows = spark.read.parquet(idx + "/data").count()

    # dead attempt for batch7: data landed, meta commit didn't — the
    # marker carries pending_token='batch7'
    S._write_ivf_meta(spark, idx, cents, "__appending__", base_rows,
                      None, "batch7")
    S.write_ivf_index(batch, None, idx, mode="append",
                      append_token="batch7")  # same-batch retry: heals
    n1 = spark.read.parquet(idx + "/data").count()
    m = S._read_ivf_meta(spark, idx)
    assert m["status"] == "committed" and m["token"] == "batch7"

    # a DIFFERENT batch against a dead attempt: refused loudly
    S._write_ivf_meta(spark, idx, cents, "__appending__", n1,
                      "batch7", "batch8")
    with pytest.raises(ValueError, match="in-flight append with"):
        S.write_ivf_index(batch, None, idx, mode="append",
                          append_token="batch9")
    # heal: the same batch8 retry completes
    S.write_ivf_index(batch.limit(0), None, idx, mode="append",
                      append_token="batch8")
    assert S._read_ivf_meta(spark, idx)["status"] == "committed"

    # '__compacting__' refuses appends until recovery finishes
    m = S._read_ivf_meta(spark, idx)
    S._write_ivf_meta(spark, idx, cents, "__compacting__", m["rows"],
                      m["token"])
    with pytest.raises(ValueError, match="finish the in-flight"):
        S.write_ivf_index(batch, None, idx, mode="append",
                          append_token="batch10")
    S.compact_ivf_index(spark, idx)  # finish-the-swap recovery
    assert S._read_ivf_meta(spark, idx)["status"] == "committed"


def test_split_hot_ivf_centroid(spark, tmp_path, monkeypatch):
    """r9 (VERDICT #6): split one fat IVF partition into k_sub
    sub-centroids — skew shrinks, no vector is lost (full-probe answers
    still equal brute force), the centroid pin stays intact (the
    pre-split list is refused), and a crash between the marker and the
    swap heals by re-running the same split."""
    import pytest

    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    cents = S.sample_centroids(emb, 2)
    idx = str(tmp_path / "skewed")
    S.write_ivf_index(emb, cents, idx)
    st = S.ivf_index_stats(spark, idx)
    parts = {
        r["centroid_id"]: r["n"]
        for r in spark.read.parquet(idx + "/data")
        .groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    }
    hot = max(parts, key=parts.get)

    def topk(p, nprobe, cl=None):
        return [
            (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
            for r in S.knn_ivf_indexed(spark, p, q, cl, k=5, nprobe=nprobe)
            .orderBy("query_id", "rank").collect()
        ]

    brute = [
        (r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
        for r in S.knn_bruteforce(emb, q, k=5)
        .orderBy("query_id", "rank").collect()
    ]
    assert topk(idx, nprobe=2) == brute  # all-partitions probe = exact

    new_cents = S.split_ivf_centroid(spark, idx, hot, k_sub=4, iters=1)
    assert len(new_cents) == 2 + 3
    st2 = S.ivf_index_stats(spark, idx)
    assert st2["status"] == "committed"
    assert st2["populated_partitions"] > st["populated_partitions"]
    assert st2["max_rows_per_partition"] < st["max_rows_per_partition"]
    assert st2["footer_rows"] == st["footer_rows"]  # nothing lost
    # meta matrix is the returned one; full probe still EXACT
    assert S._read_ivf_meta(spark, idx)["centroids"] == [
        [float(x) for x in c] for c in new_cents]
    assert topk(idx, nprobe=len(new_cents)) == brute
    # pin intact: the PRE-split list is now drifted — refused loudly
    with pytest.raises(ValueError, match="do not match"):
        S.knn_ivf_indexed(spark, idx, q, cents, k=5)
    assert topk(idx, nprobe=2, cl=new_cents)  # the new list is accepted

    # --- r10 crash discipline: the fresh sub-partitions are written
    # under dir ids no meta row names, and the ONLY commit is the meta
    # flip — a crash anywhere before it leaves the index bit-for-bit
    # committed (probes keep answering, appends keep working), and the
    # retry overwrites the dead dirs and completes
    idx2 = str(tmp_path / "crash")
    S.write_ivf_index(emb, cents, idx2)
    pre_crash = topk(idx2, nprobe=2)
    real_meta = S._write_ivf_meta

    def _die(*a, **k):
        raise RuntimeError("simulated crash before the meta flip")

    monkeypatch.setattr(S, "_write_ivf_meta", _die)
    with pytest.raises(RuntimeError, match="simulated crash"):
        S.split_ivf_centroid(spark, idx2, hot, k_sub=4, iters=1)
    monkeypatch.setattr(S, "_write_ivf_meta", real_meta)
    m = S._read_ivf_meta(spark, idx2)
    assert m["status"] == "committed"          # no intermediate state
    assert m["centroids"] == [[float(x) for x in c] for c in cents]
    assert topk(idx2, nprobe=2) == pre_crash   # probes never affected
    # the dead dirs are visible as orphans in stats, invisible to reads
    assert S.ivf_index_stats(spark, idx2)["orphan_partitions"] > 0
    # retry completes — and answers exactly like the cleanly split one
    # (deterministic training: same seeds, iters, 9dp rounding)
    S.split_ivf_centroid(spark, idx2, hot, k_sub=4, iters=1)
    m2 = S._read_ivf_meta(spark, idx2)
    assert m2["status"] == "committed"
    assert topk(idx2, nprobe=len(new_cents)) == brute
    assert topk(idx2, nprobe=2, cl=None) == topk(idx, nprobe=2, cl=None)
    # compaction retires any leftover orphans
    S.compact_ivf_index(spark, idx2)
    assert S.ivf_index_stats(spark, idx2)["orphan_partitions"] == 0
    assert topk(idx2, nprobe=len(new_cents)) == brute

    # --- LEGACY (pre-r10) '__splitting__' mid-swap state still heals
    idx3 = str(tmp_path / "legacy")
    S.write_ivf_index(emb, cents, idx3)
    import shutil

    # synthesize the pre-r10 crash window: replacement dirs staged in
    # data_split, marker pinning the new matrix + split cid
    legacy_cents = [list(c) for c in cents] + [list(cents[0])]
    hot_dir = idx3 + f"/data/centroid_id={hot}"
    shutil.copytree(hot_dir, idx3 + f"/data_split/centroid_id={hot}")
    shutil.rmtree(hot_dir)
    S._write_ivf_meta(spark, idx3, legacy_cents, "__splitting__",
                      emb.count(), split_cid=hot)
    with pytest.raises(ValueError, match="died part-way"):
        S.knn_ivf_indexed(spark, idx3, q, None, k=3)
    with pytest.raises(ValueError, match="finish the in-flight"):
        S.write_ivf_index(emb.limit(1), None, idx3, mode="append")
    with pytest.raises(ValueError, match="mid-split of centroid"):
        S.split_ivf_centroid(spark, idx3, (hot + 1) % 2, k_sub=4)
    # re-running the SAME split finishes the legacy swap
    S.split_ivf_centroid(spark, idx3, hot, k_sub=4)
    assert S._read_ivf_meta(spark, idx3)["status"] == "committed"

    # guardrails
    with pytest.raises(ValueError, match="out of range"):
        S.split_ivf_centroid(spark, idx, 99, k_sub=2)
    with pytest.raises(ValueError, match="at least 2"):
        S.split_ivf_centroid(spark, idx, 0, k_sub=1)


def test_ann_probe_equijoin_fleet_shape(spark, tmp_path):
    """r10 (VERDICT r9 wrong #2): at fleet size the indexed ANN probe
    explodes each query's probe set and HASH-joins on centroid_id
    instead of evaluating an array_contains nested-loop condition per
    (row, query) pair. Results are pinned identical across the two
    shapes; the plan is asserted to actually be a hash join."""
    import avro_spark.functions.similarity as S
    from avro_spark.functions import ivfpq_index as Q
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"))
    cents = S.sample_centroids(emb, 4)
    idx = str(tmp_path / "eq_ivf")
    S.write_ivf_index(emb, cents, idx)

    def rows(df):
        return [(r.query_id, r.rank, r.vec_id, round(r.cosine, 9))
                for r in df.orderBy("query_id", "rank").collect()]

    nested = S.knn_ivf_indexed(spark, idx, q, None, k=5, nprobe=2,
                               probe_join="broadcast")
    equi = S.knn_ivf_indexed(spark, idx, q, None, k=5, nprobe=2,
                             probe_join="equi")
    assert rows(equi) == rows(nested) and rows(equi)
    plan = equi._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
    nplan = nested._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in nplan  # the shape being replaced
    # auto picks equi at >= _EQUIJOIN_FLEET queries
    assert S._EQUIJOIN_FLEET >= 1

    # IVF-PQ mirrors the switch
    books = S.pq_codebooks(emb, m=4, k=8, refine_iters=1)
    pq = str(tmp_path / "eq_pq")
    Q.write_ivfpq_index(emb, cents, books, pq)
    nested_pq = Q.knn_ivfpq_indexed(spark, pq, q, k=5, nprobe=2,
                                    rerank=50, probe_join="broadcast")
    equi_pq = Q.knn_ivfpq_indexed(spark, pq, q, k=5, nprobe=2,
                                  rerank=50, probe_join="equi")
    assert rows(equi_pq) == rows(nested_pq) and rows(equi_pq)
    pplan = equi_pq._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in pplan
    assert "BroadcastNestedLoopJoin" not in pplan


def test_retrain_restores_drifted_ivf_index(spark, tmp_path):
    """r10 (VERDICT missing #4): months of drifted appends degrade
    MANY partitions at once — split heals one; retrain_ivf_index
    re-runs Lloyd from the current centroids, re-assigns everything,
    and commits with the same one-flip versioned swap. The fixture
    drifts append mass onto the original Voronoi boundary so a
    fixed-nprobe probe can only see half the true neighbors; retrain
    must restore full recall at the SAME nprobe (pruning intact),
    keep the exhaustive probe exact, preserve the append token, and
    refuse the pre-retrain matrix."""
    import math

    import avro_spark.functions.similarity as S
    from pyspark.sql import functions as F

    def at(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    # seed: two tight clusters at 0° and 90°; centroids pinned there
    seed_rows = [(i, at(0.0 + 0.5 * i)) for i in range(10)] + \
                [(10 + i, at(90.0 - 0.5 * i)) for i in range(10)]
    seed = spark.createDataFrame(
        seed_rows, "vec_id long, embedding array<double>")
    cents = S.kmeans_centroids(seed, 2, iters=3)
    idx = str(tmp_path / "drift")
    S.write_ivf_index(seed, cents, idx)
    # drift: appended mass straddles the 45° boundary, centered at 50°
    drift = spark.createDataFrame(
        [(100 + i, at(40.0 + i)) for i in range(21)],
        "vec_id long, embedding array<double>")
    S.write_ivf_index(drift, None, idx, mode="append", append_token="d0")

    # query just past the 45° boundary: its true top-8 straddles it
    q = spark.createDataFrame([(0, at(46.0))],
                              "query_id long, q_embedding array<double>")

    def top_ids(nprobe):
        return {r.vec_id for r in S.knn_ivf_indexed(
            spark, idx, q, None, k=8, nprobe=nprobe).collect()}

    brute = {r.vec_id for r in S.knn_bruteforce(
        seed.unionByName(drift), q, k=8).collect()}
    # exhaustive probe is exact before AND after (nothing lost)
    assert top_ids(nprobe=2) == brute
    # the drifted boundary mass makes nprobe=1 lose true neighbors
    before = top_ids(nprobe=1)
    assert before != brute
    tok_before = S._read_ivf_meta(spark, idx)["token"]
    old_cents = S._read_ivf_meta(spark, idx)["centroids"]

    new_cents = S.retrain_ivf_index(spark, idx, iters=3)
    m = S._read_ivf_meta(spark, idx)
    assert m["status"] == "committed"
    assert m["token"] == tok_before == "d0"         # token survives
    assert m["centroids"] == [[float(x) for x in c] for c in new_cents]
    assert m["versions"]["data"] >= 1                # versioned swap
    # recall restored at the SAME nprobe — the matrix fits the data
    # again, so the boundary no longer bisects the drifted mass
    assert top_ids(nprobe=1) == brute
    assert top_ids(nprobe=2) == brute
    # the pre-retrain matrix is drifted now — refused by the pin
    import pytest

    with pytest.raises(ValueError, match="do not match"):
        S.knn_ivf_indexed(spark, idx, q, old_cents, k=3)
    # a blind retry of the last committed append still no-ops
    n = spark.read.parquet(S._ivf_data_dir(idx, m)).count()
    S.write_ivf_index(drift, None, idx, mode="append", append_token="d0")
    assert spark.read.parquet(S._ivf_data_dir(
        idx, S._read_ivf_meta(spark, idx))).count() == n


def test_ivf_stats_maintenance_hint(spark, tmp_path):
    """r10: the stats report names the right remedy — one fat
    partition → split:<position>; many fat partitions → retrain."""
    import math

    import avro_spark.functions.similarity as S

    def at(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    # 8 clusters; ONE gets ~14x the mass → split hint at its position
    rows = [(100 * j + i, at(j * 45 + (i % 3))) for j in range(8)
            for i in range(3)]
    rows += [(1000 + i, at(0.5 + 0.01 * i)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [at(45 * j) for j in range(8)]
    idx = str(tmp_path / "hint")
    S.write_ivf_index(df, cents, idx)
    st = S.ivf_index_stats(spark, idx)
    assert st["hot_partitions"] == 1
    assert st["maintenance_hint"] == "split:0"
    # drift fattens THREE clusters at once → retrain, not whack-a-mole
    drift = spark.createDataFrame(
        [(2000 + 100 * j + i, at(j * 45 + 15 + 0.1 * i))
         for j in range(3) for i in range(60)],
        "vec_id long, embedding array<double>")
    S.write_ivf_index(drift, None, idx, mode="append")
    st2 = S.ivf_index_stats(spark, idx)
    assert st2["hot_partitions"] >= 3
    assert st2["maintenance_hint"] == "retrain"
    # retrain rebalances toward the data's actual mass — skew must not
    # worsen (this fixture's mass IS concentrated in few directions,
    # so perfectly even partitions are not achievable at k=8)
    S.retrain_ivf_index(spark, idx, iters=3)
    st3 = S.ivf_index_stats(spark, idx)
    assert st3["partition_row_skew"] <= st2["partition_row_skew"]


def test_jvm_dot_bit_equals_hof(spark):
    """r11: dot_fast routes through the compiled JVM UDF — it must be
    BIT-IDENTICAL to the zip_with+aggregate HOF fold on every row
    (same strict left-to-right multiply-then-accumulate), including
    float→double casts, zero-length arrays, null elements and length
    mismatches (zip_with's null padding nulls the fold)."""
    from pyspark.sql import functions as F

    from avro_spark import jvm as J
    from avro_spark.functions.similarity import dot, dot_fast

    assert J.dot_jvm(spark) is not None  # JDK present in this container
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    a = emb.select(F.col("vec_id").alias("ia"),
                   F.col("embedding").alias("va"))
    b = emb.where(F.col("vec_id") < 40).select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b)
    chk = pairs.select(dot("va", "vb").alias("h"),
                       dot_fast("va", "vb").alias("j"))
    assert chk.where(~F.col("h").eqNullSafe(F.col("j"))).count() == 0
    edge = spark.createDataFrame(
        [([], []), ([1.0, 2.0], [3.0, None]), ([1.0], [1.0, 2.0]),
         (None, [1.0])],
        "a array<double>, b array<double>",
    ).select(dot("a", "b").alias("h"), dot_fast("a", "b").alias("j"))
    rows = edge.collect()
    assert [r.h for r in rows] == [r.j for r in rows] == [0.0, None,
                                                          None, None]


def test_jvm_vector_udfs_match_hof(spark):
    """r11: the compiled ArgmaxCentroid/PqCodes/PqReconstruct UDFs must
    agree with their HOF twins on every corpus row (same strict-fold
    float semantics, same tie-breaks)."""
    import json

    from pyspark.sql import functions as F

    from avro_spark.functions import similarity as S

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = S.sample_centroids(emb, 16)
    books = S.pq_codebooks(emb, m=8, k=16)
    # HOF forms, forced by building the columns with no JVM route
    import avro_spark.functions.similarity as sim_mod

    orig = sim_mod._vec_jvm
    sim_mod._vec_jvm = lambda *a, **k: None
    try:
        hof = emb.select(
            "vec_id",
            S._argmax_centroid(F.col("embedding"), cents).alias("cid"),
            S.pq_codes(F.col("embedding"), books).alias("codes"),
        ).withColumn("recon", S.pq_reconstruct(F.col("codes"), books))
        hof_rows = {r.vec_id: (r.cid, r.codes, r.recon)
                    for r in hof.collect()}
    finally:
        sim_mod._vec_jvm = orig
    jvm = emb.select(
        "vec_id",
        S._argmax_centroid(F.col("embedding"), cents).alias("cid"),
        S.pq_codes(F.col("embedding"), books).alias("codes"),
    ).withColumn("recon", S.pq_reconstruct(F.col("codes"), books))
    assert "avsp_jvm_pq_codes" in jvm._jdf.queryExecution().toString()
    jvm_rows = {r.vec_id: (r.cid, r.codes, r.recon) for r in jvm.collect()}
    assert jvm_rows == hof_rows  # exact, including double bit-values
