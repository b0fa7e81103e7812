"""Similarity search over embedding columns (``array<float>``).

Two paths (BASELINE.json north star "similarity search"):

* **brute-force top-k** — the exact baseline: broadcast the (small) query
  set, score every (vector, query) pair with a JVM-side dot product
  (``zip_with`` + ``aggregate``), rank per query. One broadcast join +
  one shuffle for the per-query window; at 100 TB the scan dominates and
  parallelizes perfectly. All arithmetic in double for deterministic,
  oracle-matchable results.
* **IVF (inverted file)** — the scale path: k centroids (sampled
  deterministically or supplied), every vector assigned to its nearest
  centroid once (narrow), queries probe only ``nprobe`` nearest
  centroids — a (query, centroid) broadcast join prunes the scan to
  ~nprobe/k of the data before exact scoring. Recall < 1 by construction;
  verified in tests against brute force.

Random-hyperplane LSH bucketing for cosine near-dup pairs rounds this out.
No Python UDFs anywhere — higher-order functions keep it codegen'd.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double, strict left-to-right accumulation (deterministic,
    reproducible in ANSI SQL)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double; 0.0 when either vector has zero norm."""
    da, db = as_double(a), as_double(b)
    denom = l2_norm(da) * l2_norm(db)
    return F.when(denom > 0, dot(da, db) / denom).otherwise(F.lit(0.0))


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q_embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query: (query_id, rank, vec_id,
    cosine). Ties break on vec_id ascending. Queries are broadcast — the
    big side streams once with no shuffle until the per-query top-k."""
    scored = vectors.join(F.broadcast(queries)).where(
        F.col(id_col) != F.col(query_id_col)
    ).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


def assign_centroids(
    vectors: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    out_col: str = "centroid_id",
) -> DataFrame:
    """Add the nearest-centroid id (by cosine, ties → lowest id) as a narrow
    projection; centroids ride along as plan literals (no join).

    argmax via array_max over (sim, -id) structs: each cosine is computed
    once (a chained when/otherwise would duplicate the running best twice
    per step — an exponential expression tree)."""
    scored = F.array(
        *[
            F.struct(
                cosine(F.col(vec_col), _lit_vec(c)).alias("sim"),
                F.lit(-i).alias("negid"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return vectors.withColumn(
        out_col, (-F.array_max(scored)["negid"]).cast("int")
    )


def _lit_vec(vals: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vals])


def sample_centroids(
    vectors: DataFrame, n: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic centroid seed: the n vectors with the lowest ids.
    (A k-means refinement pass can replace this without changing the API.)"""
    rows = vectors.orderBy(id_col).limit(n).select(vec_col).collect()
    return [[float(x) for x in r[0]] for r in rows]


def knn_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: Sequence[Sequence[float]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q_embedding",
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` centroids nearest each
    query. The (query × centroid) ranking happens on the tiny broadcast
    side; the big scan is filtered by the centroid join before any exact
    scoring. Persist/bucket the assigned ``vectors`` by centroid_id in a
    real deployment so repeated queries skip the assignment pass."""
    assigned = assign_centroids(vectors, centroids, vec_col)
    # nprobe nearest centroids per query (small: done as plan literals too)
    probe_sets = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col),
        F.array(
            *[
                F.struct(
                    cosine(F.col(query_vec_col), _lit_vec(c)).alias("sim"),
                    F.lit(i).alias("cid"),
                )
                for i, c in enumerate(centroids)
            ]
        ).alias("_scored"),
    ).select(
        query_id_col,
        query_vec_col,
        F.slice(
            F.reverse(F.array_sort("_scored")), 1, nprobe
        ).alias("_top"),
    ).select(
        query_id_col,
        query_vec_col,
        F.transform("_top", lambda s: s["cid"]).alias("probe_cids"),
    )
    cand = assigned.join(
        F.broadcast(probe_sets),
        F.array_contains(F.col("probe_cids"), F.col("centroid_id"))
        & (F.col(id_col) != F.col(query_id_col)),
    )
    scored = cand.select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cosine")
    )


# ----------------------------------------------- random-hyperplane LSH
def _splitmix(seed: int, i: int, j: int) -> float:
    """Deterministic pseudo-gaussian-ish plane coefficient in [-1, 1)."""
    z = (seed * 0x9E3779B97F4A7C15 + (i * 1315423911 + j + 1) * 0xBF58476D1CE4E5B9) % (1 << 64)
    z ^= z >> 30
    z = (z * 0x94D049BB133111EB) % (1 << 64)
    z ^= z >> 31
    return (z % (1 << 24)) / float(1 << 23) - 1.0


def hyperplane_signature(
    vec: Column, dim: int, num_planes: int = 16, seed: int = 7
) -> Column:
    """num_planes sign bits packed into a long: bit_i = 1 iff vec·plane_i>0."""
    sig = F.lit(0).cast("long")
    v = as_double(vec)
    for i in range(num_planes):
        plane = _lit_vec([_splitmix(seed, i, j) for j in range(dim)])
        sig = sig + F.when(dot(v, plane) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def cosine_lsh_pairs(
    vectors: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    bands: int = 4,
    threshold: float = 0.9,
    seed: int = 7,
) -> DataFrame:
    """Near-dup (id_a < id_b, cosine ≥ threshold) pairs via hyperplane-LSH
    banding + exact verification. Shuffles on (band, bucket) keys only —
    the candidate set, not n², hits the verify join."""
    if num_planes % bands:
        raise ValueError("num_planes must divide into bands evenly")
    r = num_planes // bands
    mask = (1 << r) - 1
    docs = vectors.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).alias("_v"),
        hyperplane_signature(F.col(vec_col), dim, num_planes, seed).alias("_sig"),
    )
    chunks = docs.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("_sig"), r * i)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("c"),
    ).select("_id", "c.band", "c.bucket")
    cand = (
        chunks.alias("l")
        .join(chunks.alias("r"), on=["band", "bucket"])
        .where(F.col("l._id") < F.col("r._id"))
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    return (
        cand.join(docs.select(F.col("_id").alias("id_a"), F.col("_v").alias("v_a")), "id_a")
        .join(docs.select(F.col("_id").alias("id_b"), F.col("_v").alias("v_b")), "id_b")
        .select("id_a", "id_b", cosine(F.col("v_a"), F.col("v_b")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
