"""Corpus statistics for LLM-data curation (beyond-reference
extension): heavy hitters, TF-IDF, per-group quantiles, and a bigram
language-model scorer (perplexity proxy for quality filtering).

Design for 100 TB:

* :func:`heavy_hitters` is explode + map-side-combined count, then a
  global top-k. The top-k is ``orderBy(...).limit(k)`` which Spark
  executes as ``TakeOrderedAndProject`` — each partition keeps only its
  k best rows and the driver merges k·P rows, never a full sort. The
  count shuffle is keyed on the term, so skew equals natural token skew
  (bounded by vocabulary size after the combiner).
* :func:`tfidf_topk` shuffles once on (doc, term) for tf, once on term
  for df, then ranks per-document with a window PARTITIONED BY the
  document — never a global window.
* :func:`group_quantiles` uses the exact ``percentile`` aggregate
  (linear interpolation, same convention as ANSI ``quantile_cont``) —
  exact needs a per-group sort, so the scale path is
  :func:`group_quantiles_approx` (``percentile_approx``, a mergeable
  QuantileSummaries sketch: map-side partial, no per-group sort).
* :func:`bigram_lm_scores` trains corpus bigram/unigram counts (two
  map-side-combined aggregates) and scores each document by joining its
  bigrams against the count tables — shuffle joins keyed on the bigram,
  no driver-side model materialization, so the "model" can be as large
  as the corpus vocabulary. All JVM-side; no Python stage anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import ws_tokens


def token_counts(docs: DataFrame, text: str = "text") -> DataFrame:
    """(term, n): corpus-wide lowercase whitespace-token counts.
    The canonical word-count shape: explode + one count shuffle with
    map-side combine."""
    return (
        docs.select(F.explode(ws_tokens(F.lower(F.col(text)))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )


def heavy_hitters(
    docs: DataFrame,
    text: str = "text",
    k: int = 50,
    min_count: int = 1,
) -> DataFrame:
    """Top-k most frequent corpus tokens, deterministically tie-broken
    by term. Executed as TakeOrderedAndProject (per-partition top-k +
    driver merge of k rows per partition) — no global sort."""
    counts = token_counts(docs, text)
    if min_count > 1:
        counts = counts.where(F.col("n") >= min_count)
    return counts.orderBy(F.col("n").desc(), F.col("term").asc()).limit(k)


def tfidf_topk(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text: str = "text",
    k: int = 5,
) -> DataFrame:
    """(doc_id, term, tf, score, rank): top-k TF-IDF terms per document.

    tf is the raw in-document count; idf is the smooth variant
    ``ln((1 + N) / (1 + df)) + 1`` (never negative, defined for df = N).
    Ties break on (score desc, term asc) so output is deterministic.
    """
    toks = docs.select(
        F.col(doc_id).alias("_doc"),
        F.explode(ws_tokens(F.lower(F.col(text)))).alias("term"),
    )
    tf = toks.groupBy("_doc", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.select(F.countDistinct(F.col(doc_id)).alias("n")).withColumn(
        "_k", F.lit(1)
    )
    scored = (
        # df via a window over tf — tf rows are distinct (doc, term), so
        # count-per-term IS the document frequency; the former
        # groupBy(term) + join re-executed the whole tokenize+tf
        # subtree a second time per action (no CSE across self-joins)
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(n_docs), "_k")
        .select(
            "_doc",
            "term",
            "tf",
            (
                F.col("tf")
                * (F.log((1.0 + F.col("n")) / (1.0 + F.col("df"))) + 1.0)
            ).alias("score"),
        )
    )
    w = Window.partitionBy("_doc").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("_doc").alias(doc_id), "term", "tf", "score", "rank")
    )


def _explode_quantiles(
    df: DataFrame, group_col: str, agg_col, qlist: "list[float]"
) -> DataFrame:
    """Shared (group, q, value) unpacking for the exact and approx
    quantile aggregates — ONE place defines the output shape."""
    agg = df.groupBy(group_col).agg(agg_col.alias("_vals"))
    pairs = F.arrays_zip(
        F.array(*[F.lit(q) for q in qlist]).alias("q"), F.col("_vals").alias("value")
    )
    return agg.select(
        group_col, F.explode(pairs).alias("_p")
    ).select(
        group_col,
        F.col("_p.q").alias("q"),
        F.col("_p.value").alias("value"),
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """(group, q, value): EXACT linear-interpolation quantiles per group
    (the ``quantile_cont`` convention). One row per (group, quantile).

    Exact quantiles sort within each group — fine for bounded group
    cardinality; for per-group data too big to sort use
    :func:`group_quantiles_approx`."""
    qlist = [float(q) for q in qs]
    return _explode_quantiles(
        df,
        group_col,
        F.percentile(F.col(value_col), F.array(*[F.lit(q) for q in qlist])),
        qlist,
    )


def group_quantiles_approx(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
) -> DataFrame:
    """Scale path for :func:`group_quantiles`: ``percentile_approx``
    (QuantileSummaries sketch — mergeable, map-side partial aggregation,
    no per-group sort). Same output shape; values within 1/accuracy
    rank error of exact."""
    qlist = [float(q) for q in qs]
    return _explode_quantiles(
        df,
        group_col,
        F.percentile_approx(
            F.col(value_col),
            F.array(*[F.lit(q) for q in qlist]),
            F.lit(accuracy),
        ),
        qlist,
    )


def _doc_bigrams(docs: DataFrame, doc_id: str, text: str) -> DataFrame:
    """(doc_id, left, right) per adjacent lowercase token pair."""
    toks = docs.select(
        F.col(doc_id).alias("_doc"), ws_tokens(F.lower(F.col(text))).alias("t")
    )
    return toks.where(F.size("t") >= 2).select(
        "_doc",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i - 1] AS left, t[i] AS right))"
            )
        ).alias("p"),
    ).select("_doc", F.col("p.left").alias("left"), F.col("p.right").alias("right"))


def bigram_lm_scores(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text: str = "text",
    alpha: float = 1.0,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob): average add-alpha-smoothed
    bigram log-probability of each document under the corpus's own
    bigram LM — the standard cheap perplexity proxy for quality
    filtering (low avg_logprob ≈ gibberish / boilerplate outliers).

    ``P(r | l) = (c(l, r) + alpha) / (c(l, ·) + alpha · V)`` where V is
    the corpus vocabulary size. Documents with < 2 tokens get
    n_bigrams = 0 and NULL avg_logprob. Train and score are over the
    same corpus; to score against a held-out model, compute the count
    tables on the training corpus and join here.
    """
    bg = _doc_bigrams(docs, doc_id, text)
    vocab = (
        docs.select(F.explode(ws_tokens(F.lower(F.col(text)))).alias("term"))
        .agg(F.countDistinct("term").alias("v"))
        .withColumn("_k", F.lit(1))
    )
    # counts via windows over the ONE bigram stream: c(l, r) is the
    # window count per (left, right) and c(l, ·) the window count per
    # left (each bigram row is one occurrence, so sum-of-pair-counts ≡
    # row count). The former groupBy+join formulation re-executed the
    # tokenize+bigram subtree once per join side — three corpus passes
    # for the same integers.
    scored = (
        bg.withColumn(
            "c_pair",
            F.count("*").over(Window.partitionBy("left", "right")),
        )
        .withColumn("c_left", F.count("*").over(Window.partitionBy("left")))
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(vocab), "_k")
        .select(
            "_doc",
            F.log(
                (F.col("c_pair") + alpha)
                / (F.col("c_left") + alpha * F.col("v"))
            ).alias("_lp"),
        )
    )
    per_doc = scored.groupBy("_doc").agg(
        F.count("*").alias("n_bigrams"),
        (F.sum("_lp") / F.count("*")).alias("avg_logprob"),
    )
    # left-join back so token-poor docs (no bigrams) still appear
    all_docs = docs.select(F.col(doc_id).alias("_doc"))
    return (
        all_docs.join(per_doc, "_doc", "left")
        .select(
            F.col("_doc").alias(doc_id),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — the mergeable
# frequency sketch for streams/shards too large to count exactly. The
# sketch is a d×w counter grid; an item's estimate is the MIN of its d
# counters, biased high by collisions only (never low). At 100 TB the
# point is the communication bound: each executor partially aggregates
# its partition into ≤ d×w counters map-side, so the shuffle carries
# P×d×w integers, independent of row count or key cardinality — and two
# sketches (shards, days, streaming micro-batches) merge by plain
# counter addition.

from avro_spark.functions.dedup import portable_hash60 as _phash60


def _cms_bucket(key: Column, row: int, w: int, hash_fn) -> Column:
    """Row-``row`` bucket for ``key``: hash of the salted key mod w.
    The per-row salt prefix makes the d hash functions independent."""
    return F.pmod(hash_fn(F.concat(F.lit(f"cms{row}:"), key)), F.lit(w)).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    weight_col: "str | None" = None,
    hash_fn=None,
) -> DataFrame:
    """Build a count-min sketch over ``key_col`` (optionally summing
    ``weight_col`` instead of counting rows). Returns the dense-ish
    counter table ``(row, bucket, count)`` — at most d×w rows, one
    shuffle, map-side partially aggregated. ``hash_fn`` defaults to the
    portable md5 hash (oracle-exact); pass ``F.xxhash64`` at scale."""
    if hash_fn is None:
        hash_fn = _phash60
    key = F.col(key_col).cast("string")
    weight = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    pairs = df.select(
        F.posexplode(
            F.array(*[_cms_bucket(key, r, w, hash_fn) for r in range(d)])
        ).alias("row", "bucket"),
        weight.alias("_w"),
    )
    return pairs.groupBy("row", "bucket").agg(F.sum("_w").alias("count"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (d, w, hash_fn): counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("count").alias("count"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 1024,
    hash_fn=None,
    out_col: str = "cms_estimate",
) -> DataFrame:
    """Point-query estimates for every row of ``keys`` (duplicates
    preserved): min over the d counters addressed by the key's buckets
    (0 when a bucket was never touched). The sketch side is ≤ d×w rows —
    broadcast-joined once per row index, so the lookup is d narrow
    streamed joins with NO shuffle of ``keys`` however large it is."""
    if hash_fn is None:
        hash_fn = _phash60
    key = F.col(key_col).cast("string")
    out = keys
    for r in range(d):
        skr = sketch.where(F.col("row") == r).select(
            F.col("bucket").alias(f"_b{r}"), F.col("count").alias(f"_c{r}")
        )
        out = out.join(
            F.broadcast(skr),
            _cms_bucket(key, r, w, hash_fn) == F.col(f"_b{r}"),
            "left",
        )
    est = F.least(*[F.coalesce(F.col(f"_c{r}"), F.lit(0).cast("long"))
                    for r in range(d)])
    return out.select(*keys.columns, est.alias(out_col))
