"""Semantic (embedding-space) deduplication — SemDeDup re-expressed
as DataFrame ops (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication").

Exact/MinHash dedup catches lexical near-copies; semantic dedup
catches REWRITES — documents whose embeddings nearly coincide even
though their text differs. The SemDeDup recipe: cluster the
embeddings (so the quadratic pair search never crosses cluster
boundaries), compute pairwise cosine WITHIN each cluster, and keep one
representative per ε-ball.

Determinism contract (the keeper rule): a row is DROPPED iff some
lower-id row in the SAME cluster has cosine ≥ ``threshold`` with it;
``dup_of`` names the lowest such id. This is the anchored-greedy
variant — like :func:`dedup.exact_dedup_groups`, the keeper is the
minimum NATIVE-ordered id, and the rule is a pure predicate of the
input (no iteration-order dependence), so it is replayable and
SQL-expressible for oracles. Note the deliberate chain behavior:
with A~B and B~C but A≁C, B drops (shadowed by A) and C drops
(shadowed by B, kept or not) — shadowing does not require the shadow
to survive. The connected-components alternative (one keeper per
transitive group) is :func:`dedup.dedup_clusters` over these pairs.

Scale shape: the ONLY shuffle is the self-join keyed on
``centroid_id``; each cluster's pair search is quadratic BY DESIGN
(that is SemDeDup's trade: k centroids bound the per-cluster row count
to ~n/k, so the total pair work is n²/k instead of n²). The plan scans
the input three times (both self-join sides + the final decision
join) — a declarative trade made knowingly: the projection is narrow
(id, vector, norm, assignment), the scans pipeline with no
materialization footprint, and the n²/k pair stage dominates total
cost asymptotically; a caller running repeated passes can persist the
input. Size k so the largest cluster's pair count fits an executor's
task budget —
:func:`similarity.ivf_index_stats`-style skew applies; a hot cluster
is a signal to raise k or split (:func:`similarity.split_ivf_centroid`
machinery). Ids keep their native type (string/UUID ids order
correctly — no silent long cast). No Python UDFs; cosine is the
codegen'd higher-order-function arithmetic from :mod:`similarity`.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import (
    _argmax_centroid,
    _matrix_lit,
    _normalize_rows,
    as_double,
    dot,
    dot_fast,
    l2_norm,
)


def _probe_positions(vec, centroids, nprobe: int):
    """Top-``nprobe`` centroid positions by cosine for ``vec`` — the
    IVF probe expression (sim desc, ties → lowest position, matching
    :func:`similarity._argmax_centroid`'s assignment tie-break)."""
    cmat = _matrix_lit(_normalize_rows(centroids))
    scored = F.transform(
        cmat,
        lambda c, i: F.struct(
            dot(vec, c).alias("sim"),
            (-i).cast("int").alias("ncid"),
            i.cast("int").alias("cid"),
        ),
    )
    return F.transform(
        F.slice(F.reverse(F.array_sort(scored)), 1, nprobe),
        lambda s: s["cid"],
    )


def semantic_dedup(
    vectors: DataFrame,
    centroids: Sequence[Sequence[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Per-row keep/drop decisions: (<id>, centroid_id, keep, dup_of).

    ``keep`` is false iff a lower-id row SHADOWS the row: at the
    default ``nprobe=1``, a lower-id row in the same centroid cluster
    with cosine ≥ ``threshold`` (the exact SemDeDup rule, SQL-oracle
    replicable); ``dup_of`` is the LOWEST such id (null for keepers).
    Zero-norm vectors have cosine 0.0 with everything (the
    :func:`similarity.cosine` contract) and so are always kept for any
    positive threshold. Output has one row per input row.

    ``nprobe > 1`` (r10, VERDICT missing #3) bounds the cross-cluster
    recall loss: a near-dup pair straddling a Voronoi boundary is
    invisible at ANY k when each row compares only within its own
    cluster. Multi-probe routes each row's PAIR SEARCH to its top
    ``nprobe`` centroids — the shadowing (lower-id) side stays keyed by
    its primary assignment only, so a pair is compared iff the lower
    id's primary cluster lands in the higher id's probe set (the
    standard IVF multi-probe shape: data indexed once, queries probe
    wider). Pair work grows ~``nprobe``× (the probe side explodes to
    nprobe rows; the indexed side does not), not ``nprobe``²×.
    Decisions stay one row per input; the keeper rule is unchanged.

    ``centroids`` typically come from
    :func:`similarity.kmeans_centroids`; they are routing anchors, not
    semantics — a finer clustering trades recall (cross-cluster
    near-dups are never compared) for less quadratic work, exactly the
    SemDeDup trade; ``nprobe=2`` buys most of that recall back for 2×
    pair work."""
    from .dedup import _native_id

    if nprobe < 1:
        raise ValueError("nprobe must be >= 1")
    nprobe = min(nprobe, len(centroids))
    # null ids would silently vanish from the `<` pair predicate (a
    # null-id row could never be dropped) — the family's checked id
    # contract raises row-locally instead
    a = vectors.select(
        _native_id(id_col).alias(id_col),
        as_double(F.col(vec_col)).alias("_v"),
        l2_norm(vec_col).alias("_n"),
        _argmax_centroid(F.col(vec_col), centroids).alias("centroid_id"),
        (_probe_positions(as_double(F.col(vec_col)), centroids, nprobe)
         if nprobe > 1
         else F.array(_argmax_centroid(F.col(vec_col), centroids))
         ).alias("_probes"),
    )
    pairs = _pair_candidates(a, id_col)
    denom = F.col("_lo_n") * F.col("_hi_n")
    cos = F.when(denom > 0, dot_fast("_lo_v", "_hi_v") / denom).otherwise(
        F.lit(0.0))
    drops = pairs.where(cos >= F.lit(float(threshold))) \
        .groupBy("_hi_id").agg(F.min("_lo_id").alias("dup_of"))
    return (
        a.join(drops, a[id_col] == drops["_hi_id"], "left")
        .select(
            F.col(id_col),
            "centroid_id",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
    )


def _pair_candidates(a: DataFrame, id_col: str) -> DataFrame:
    """The (lo, hi) candidate-pair frame ``semantic_dedup`` scores:
    the lower-id side keyed by its PRIMARY cluster, the higher-id side
    exploded over its probe set, equi-joined on the cluster id. A pair
    joins at most once (probe sets hold distinct positions). Factored
    out so tests can MEASURE pair work per nprobe directly."""
    lo = a.select(
        F.col(id_col).alias("_lo_id"), F.col("_v").alias("_lo_v"),
        F.col("_n").alias("_lo_n"), F.col("centroid_id").alias("_c"),
    )
    hi = a.select(
        F.col(id_col).alias("_hi_id"), F.col("_v").alias("_hi_v"),
        F.col("_n").alias("_hi_n"), F.explode("_probes").alias("_c"),
    )
    return lo.join(hi, "_c").where(F.col("_lo_id") < F.col("_hi_id"))


def semantic_dedup_against_index(
    spark,
    index_path: str,
    batch: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """INCREMENTAL semantic dedup — the daily-batch face: each batch
    vector keeps iff its nearest neighbor in the PERSISTED IVF index
    (:func:`similarity.write_ivf_index`) has cosine below
    ``threshold``. Returns one row per batch row: (<id>, nn_id,
    cosine, keep) — ``nn_id``/``cosine`` are the probe's top-1 (null /
    no row when the probed partitions hold no candidate at all, which
    keeps). This completes the incremental-dedup family: exact →
    :mod:`exact_index`, lexical near-dup → the MinHash index, semantic
    → this probe; admitted vectors grow the index via
    ``write_ivf_index(mode="append")`` or
    :func:`similarity.index_vectors_stream`.

    Scale shape is the IVF probe's (partition-pruned scan, broadcast
    queries, k=1): probe IO ~nprobe/k_centroids of the index, never a
    corpus pass and never the batch-quadratic pair join of the batch
    :func:`semantic_dedup`. Approximation contract: the neighbor is
    the INDEX probe's best (nprobe-bounded recall), so a near-dup
    hiding in an unprobed partition is missed — the same recall trade
    every IVF query makes; raise ``nprobe`` to tighten it."""
    from .similarity import knn_ivf_indexed

    from .dedup import _native_id

    q = batch.select(
        _native_id(id_col).alias("query_id"),
        F.col(vec_col).alias("q_embedding"),
    )
    nn = knn_ivf_indexed(
        spark, index_path, q, None, k=1, nprobe=nprobe,
        exclude_self=exclude_self,
    ).select(
        F.col("query_id").alias(id_col),
        F.col("vec_id").alias("nn_id"),
        "cosine",
    )
    return (
        batch.select(id_col)
        .join(nn, id_col, "left")
        .select(
            F.col(id_col), "nn_id", "cosine",
            (F.col("cosine").isNull()
             | (F.col("cosine") < F.lit(float(threshold)))).alias("keep"),
        )
    )


# ----------------------------- streaming face of incremental semantic dedup
def _stream_semantic_sink(
    index_path: str,
    decisions_path: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    admit: str = "novel",
    nprobe: int = 4,
):
    """The foreachBatch callable behind :func:`semantic_dedup_stream`,
    factored out so replay idempotence is directly testable. Per
    micro-batch, in crash-safe order (the exact-dedup streaming sink's
    shape, :func:`exact_index._stream_exact_sink`):

    1. recorded batch id → return (exactly-once across restarts);
    2. if the IVF index's meta already carries this batch's token
       (committed, or pending on a dead mid-append attempt), the batch
       WAS probed before any of it entered the index — the replay
       REUSES the committed ``{decisions_path}/batch=<id>/`` instead
       of re-probing an index that now contains the batch's own
       vectors (which would mark every admitted vector a near-dup of
       itself);
    3. otherwise WITHIN-batch semantic dedup first
       (:func:`semantic_dedup` against the index's PINNED centroids —
       lowest id per ε-ball wins), probe the survivors
       (:func:`semantic_dedup_against_index`), and OVERWRITE this
       batch's decisions dir (a replay REPLACES, never doubles);
    4. append the admitted vectors (``admit="novel"``: keep=true
       survivors; ``"all"``: every survivor) with
       ``append_token=f"batch{batch_id}"`` — a committed-token retry
       no-ops, a crash mid-append heals on the same-token retry;
    5. record the batch id LAST as the whole-batch commit marker."""
    if admit not in ("novel", "all"):
        raise ValueError(f"bad admit: {admit}")

    from .dedup import _append_batch_registry, _read_batch_registry
    from .similarity import _read_ivf_meta, write_ivf_index

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        applied = _read_batch_registry(spark, f"{index_path}/batches")
        if batch_id in applied:
            return
        token = f"batch{batch_id}"
        m = _read_ivf_meta(spark, index_path)
        probed_already = m["token"] == token or (
            m["status"] == "__appending__"
            and m["pending_token"] == token)
        within = semantic_dedup(batch_df, m["centroids"], threshold,
                                id_col, vec_col)
        survivors = batch_df.join(
            F.broadcast(within.where("keep").select(id_col)),
            id_col, "left_semi")
        if not probed_already:
            decisions = semantic_dedup_against_index(
                spark, index_path, survivors, threshold, id_col,
                vec_col, nprobe=nprobe)
            decisions.write.mode("overwrite").parquet(
                f"{decisions_path}/batch={batch_id}")
        admitted_ids = (
            spark.read.parquet(f"{decisions_path}/batch={batch_id}")
            .where("keep" if admit == "novel" else F.lit(True))
            .select(id_col)
        )
        admitted = batch_df.join(F.broadcast(admitted_ids), id_col,
                                 "left_semi")
        write_ivf_index(admitted, None, index_path, id_col, vec_col,
                        mode="append", append_token=token)
        _append_batch_registry(spark, f"{index_path}/batches", batch_id)

    return sink


def semantic_dedup_stream(
    df: DataFrame,
    index_path: str,
    decisions_path: str,
    checkpoint_dir: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    admit: str = "novel",
    nprobe: int = 4,
    trigger_available_now: bool = False,
    query_name: "Optional[str]" = None,
):
    """STREAMING incremental semantic dedup — completes the streaming
    faces of the incremental-dedup family (exact →
    :func:`exact_index.dedup_exact_stream`, lexical →
    :func:`dedup.dedup_stream_against_index`'s MinHash sink, semantic
    → this): each embedding micro-batch is within-batch deduped against
    the index's PINNED centroids, probed against the PERSISTED IVF
    index (top-1 cosine vs ``threshold``), its decisions written under
    ``{decisions_path}/batch=<id>``, and the admitted vectors appended
    exactly-once. The index must exist (:func:`similarity.
    write_ivf_index` over the seed corpus — possibly empty is NOT
    supported here: IVF needs trained centroids; seed with
    :func:`similarity.kmeans_centroids`). One streaming query per
    index (writer lease). Returns the started ``StreamingQuery``."""
    sink = _stream_semantic_sink(index_path, decisions_path, threshold,
                                 id_col, vec_col, admit, nprobe)
    writer = (
        df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def semantic_dedup_keepers(
    vectors: DataFrame,
    centroids: Sequence[Sequence[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The curation face: the input rows that SURVIVE semantic dedup
    (all original columns), ready to feed the next pipeline stage."""
    decisions = semantic_dedup(vectors, centroids, threshold, id_col,
                               vec_col)
    keep_ids = decisions.where("keep").select(id_col)
    return vectors.join(keep_ids, id_col, "left_semi")
