"""Lexical retrieval over the documents table (beyond-reference
extension): BM25 scoring through an inverted-index join, plus the
adjacent-pair counting that seeds BPE vocabulary training.

Design for 100 TB:

* :func:`bm25_scores` builds postings by exploding the token array and
  aggregating per (doc, term) — ONE shuffle keyed on (doc, term) with
  map-side combine, then a shuffle on term for document frequencies.
  The query side is tiny (a handful of terms per query) and broadcasts,
  so candidate generation touches only documents containing at least
  one query term — never a full cross product. Final per-(query, doc)
  score is one more keyed aggregate. All JVM-side; no Python stage.
* :func:`bpe_pair_counts` is explode + groupBy-count — the canonical
  map-side-combined word-count shape; at 100 TB the combiner collapses
  each partition's pairs before the single shuffle.

Tokenization matches functions/text.py's whitespace convention
(lowercase, ``\\s+`` split) so oracles can replicate it verbatim.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import ws_tokens


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    doc_id: str = "doc_id",
    text: str = "text",
    query_id: str = "query_id",
    query_text: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, score): Okapi BM25 of every document that
    shares at least one term with the query. idf uses the
    non-negative variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Repeated query terms count once (set semantics), matching standard
    BM25 practice and keeping the oracle formulation simple.

    Scale shape: the broadcast query-term filter lands BEFORE any
    aggregation, so tf/df are computed over query-term tokens only —
    the corpus-wide (doc, term) postings build (a shuffle of every
    token pair) never happens. Document length is a narrow
    ``size(tokens)`` projection (no aggregation); its global average is
    one map-side-combined 1-row aggregate. The only full-corpus shuffle
    left is the (doc_id, dl) pair join — two longs per document.
    """
    base = docs.select(
        F.col(doc_id).alias("_doc"), ws_tokens(F.lower(F.col(text))).alias("_t")
    )
    # dl needs no aggregation at all — it is the token-array length
    dl = base.select("_doc", F.size("_t").alias("dl"))
    # carry dl THROUGH the explode (size() is O(1) array metadata): the
    # per-doc length rides on every token row, so tf can keep it in its
    # aggregate and the full-corpus (doc_id, dl) shuffle join the r10
    # plan paid — the only corpus-wide shuffle left then — disappears,
    # along with one of the plan's three tokenize passes (guide §2.4)
    toks = base.select("_doc", "_t", F.explode("_t").alias("term")).select(
        "_doc", F.size("_t").alias("dl"), "term"
    )
    qterms = queries.select(
        F.col(query_id).alias("_q"),
        F.explode(F.array_distinct(ws_tokens(F.lower(F.col(query_text))))).alias(
            "term"
        ),
    )
    qterm_set = qterms.select("term").distinct()
    # broadcast-filter FIRST: only query-term tokens reach the shuffle
    cand_toks = toks.join(F.broadcast(qterm_set), "term")
    tf = cand_toks.groupBy("_doc", "term").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )
    # df via a window over tf — tf rows are distinct (doc, term), so
    # count-per-term IS the document frequency. The former
    # groupBy(term) + broadcast join re-inlined (and so re-executed)
    # the whole tokenize+tf subtree once more per action; the window is
    # one small exchange over the already-filtered tf rows instead.
    df_w = Window.partitionBy("term")
    n_docs = docs.select(F.count("*").alias("n")).withColumn("_k", F.lit(1))
    # average over documents WITH tokens (token-less docs can never be
    # candidates and the standard avgdl convention excludes them)
    avgdl = (
        dl.where(F.col("dl") > 0)
        .agg(F.avg("dl").alias("avgdl"))
        .withColumn("_k", F.lit(1))
    )
    cand = tf.withColumn("df", F.count("*").over(df_w)).join(
        F.broadcast(qterms), "term"
    )
    scored = (
        cand.withColumn("_k", F.lit(1))
        .join(F.broadcast(n_docs), "_k")
        .join(F.broadcast(avgdl), "_k")
        .select(
            "_q",
            "_doc",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("_term_score"),
        )
    )
    return (
        scored.groupBy("_q", "_doc")
        .agg(F.sum("_term_score").alias("score"))
        .select(
            F.col("_q").alias(query_id),
            F.col("_doc").alias(doc_id),
            "score",
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    doc_id: str = "doc_id",
    text: str = "text",
    query_id: str = "query_id",
    query_text: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    tie_decimals: "int | None" = None,
) -> DataFrame:
    """Top-k BM25 hits per query, deterministically tie-broken by
    (score desc, doc_id asc). One window pass over the scored
    candidates (partitioned per query — never a global sort).

    ``tie_decimals`` ranks on the ROUNDED score (see
    :func:`avro_spark.functions.text_index.bm25_indexed` — fp addition
    is not associative, so docs with identical term-score multisets
    can land 1 ulp apart by aggregation order; rounding makes the
    doc-id tie-break engine- and partitioning-independent)."""
    scores = bm25_scores(
        docs, queries, doc_id, text, query_id, query_text, k1, b
    )
    rank_score = (F.round("score", tie_decimals)
                  if tie_decimals is not None else F.col("score"))
    w = Window.partitionBy(query_id).orderBy(
        rank_score.desc(), F.col(doc_id).asc()
    )
    return (
        scores.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, doc_id, "score", "rank")
    )


def bpe_pair_counts(
    docs: DataFrame,
    text: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(left, right, n_pairs): counts of ADJACENT lowercase token pairs
    across the corpus — the statistic a BPE/WordPiece vocabulary build
    merges on. Pure explode + map-side-combined count (one shuffle)."""
    toks = docs.select(ws_tokens(F.lower(F.col(text))).alias("t"))
    # size < 2 filtered BEFORE sequence(): Spark's sequence(1, 0) counts
    # DOWN ([1, 0]), it is not empty
    pairs = toks.where(F.size("t") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(t[i - 1] AS left, t[i] AS right))"
            )
        ).alias("p")
    )
    out = (
        pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.count("*").alias("n_pairs"))
    )
    if min_count > 1:
        out = out.where(F.col("n_pairs") >= min_count)
    return out


def _bpe_pick_batch(top: list, limit: int, truncated: bool) -> list:
    """Maximal prefix of the (count desc, left, right)-sorted pair list
    that sequential greedy BPE is GUARANTEED to merge in this order:

    * pairs must be mutually non-interacting — no shared token among
      each pair's raw tokens AND its merged token (the merged token
      matters: (a,b) and (ab,c) are raw-disjoint, yet merging (a,b)
      creates ``ab`` tokens that change (ab,c)'s count). With merged
      tokens in the conflict set, every kept pair's OWN count is
      invariant under the other kept merges;
    * ORDER boundary: every kept pair's count must be STRICTLY greater
      than the first pair left behind for any reason (so ties — incl.
      lexicographic ones — never reorder against static leftovers);
    * GAIN boundary: every kept pair's count must also be STRICTLY
      greater than FOUR TIMES the highest-counted pair that INTERACTS
      with the batch (shares a kept raw or merged token — scanned over
      the whole fetched list, or the fetch floor when truncated). Only
      interacting pairs can change count, and each gain instance maps
      to an instance of an existing interacting context pair: the
      junction pair when both sides are freshly merged ("a b c d" →
      (ab, cd) maps to (b, c)), or the (right-raw-of-u, v) /
      (u, left-raw-of-v) pair when one side already existed raw. Three
      families plus the pre-count, each at or below the gain boundary
      ⇒ post ≤ 4·gain_boundary — nothing can rise to outrank (or tie
      into the lexicographic order of) anything kept. THIS is what a
      naive order-only boundary misses when a merged token already
      exists raw in the corpus (e.g. raw "ab" plus merging (a,b)
      boosts an existing (x, ab) above other accepted pairs). When NO
      interacting pair exists at all, no gains are possible and the
      order boundary alone suffices — the fully-disjoint-pairs corpus
      batches freely;
    * a SELF-pair (x, x) closes the batch: run-merging "m m m m" makes
      merged tokens adjacent to each other and to leftovers, creating
      (mm, mm) / (mm, m) pairs bounded only by the rule's own count —
      nothing after it is provably safe this round.

    Batched greedy therefore equals one-at-a-time greedy, merge for
    merge.
    """
    accepted: list = []
    used: set[str] = set()
    order_boundary = None
    self_gain = None
    for row in top:
        if len(accepted) == limit:
            order_boundary = row["n_pairs"]
            break
        joined = row["left"] + row["right"]
        if row["left"] in used or row["right"] in used or joined in used:
            order_boundary = row["n_pairs"]
            break
        if row["left"] == row["right"]:
            # safe only alone: close the batch at this rule's own count
            if not accepted:
                accepted.append(row)
            order_boundary = row["n_pairs"]
            self_gain = row["n_pairs"]
            break
        accepted.append(row)
        used.add(row["left"])
        used.add(row["right"])
        used.add(joined)
    else:
        if truncated and top:
            # unseen pairs may tie the last fetched count
            order_boundary = top[-1]["n_pairs"]
    # gain boundary: the best interacting pair anywhere in the fetched
    # list (non-accepted), or the fetch floor when the list is truncated
    # (unseen pairs might interact)
    acc_ids = {id(r) for r in accepted}
    gain_boundary = self_gain
    for row in top:
        if id(row) in acc_ids:
            continue
        joined = row["left"] + row["right"]
        if row["left"] in used or row["right"] in used or joined in used:
            gain_boundary = row["n_pairs"] if gain_boundary is None \
                else max(gain_boundary, row["n_pairs"])
            break  # sorted desc: the first interacting one is the max
    if truncated and top:
        floor = top[-1]["n_pairs"]
        gain_boundary = floor if gain_boundary is None else max(gain_boundary, floor)
    if order_boundary is not None:
        accepted = [r for r in accepted if r["n_pairs"] > order_boundary]
    if gain_boundary is not None:
        accepted = [r for r in accepted if r["n_pairs"] > 4 * gain_boundary]
    if not accepted and top:
        # the global max is always safe alone (nothing outranks it, and
        # lexicographic ties were already resolved by the sort)
        accepted = [top[0]]
    return accepted


def _bpe_fold(col: Column, left: str, right: str) -> Column:
    """Leftmost-first non-overlapping single-rule rewrite: fold each
    token into the output array, replacing a trailing ``left`` when the
    next token is ``right``. The merged token differs from ``left`` (it
    is strictly longer), so a fresh merge never cascades within the same
    rule — the classic BPE convention."""
    joined = left + right
    return F.aggregate(
        col,
        F.array().cast("array<string>").alias("acc"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(joined)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    text: str = "text",
    num_merges: int = 10,
    checkpoint_every: int = 4,
    batch_size: int = 8,
):
    """Train ``num_merges`` BPE merge rules over whitespace tokens:
    greedily merge the corpus-wide most frequent ADJACENT token pair
    (ties broken by (left, right) so the vocabulary is deterministic),
    rewriting every occurrence as the concatenated token, leftmost-first
    non-overlapping — the classic BPE step, with whitespace tokens
    standing in for the byte alphabet.

    Returns ``(merges, tokens)``: ``merges`` is a DataFrame
    (step, left, right, n_pairs); ``tokens`` the final rewritten token
    arrays (column ``t``).

    Scale: vocabulary building is inherently iterative (each rule
    depends on the rewrite of all earlier ones), but up to
    ``batch_size`` NON-INTERACTING rules are proven safe to take from
    one count (see :func:`_bpe_pick_batch`) — so a round is ONE
    map-side-combined pair-count shuffle + one bounded
    TakeOrderedAndProject (≤ 4·batch_size rows ever reach the driver)
    + a chain of narrow ``aggregate`` folds applied in rank order
    inside a single projection. Driver round-trips drop ~batch_size×
    versus one-merge-per-job; ``batch_size=1`` degenerates to the
    textbook loop (the equivalence tests compare the two).
    ``localCheckpoint`` every ``checkpoint_every`` rounds truncates the
    growing fold lineage, like the connected-components loop in
    functions/dedup.py.
    """
    spark = docs.sparkSession
    cur = docs.select(ws_tokens(F.lower(F.col(text))).alias("t"))
    fetch = max(4 * batch_size, 8)
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < num_merges:
        pairs = (
            cur.where(F.size("t") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t) - 1),"
                        " i -> struct(t[i - 1] AS left, t[i] AS right))"
                    )
                ).alias("p")
            )
            .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
            .agg(F.count("*").alias("n_pairs"))
        )
        top = (
            pairs.orderBy(
                F.col("n_pairs").desc(), F.col("left").asc(), F.col("right").asc()
            )
            .limit(fetch)
            .collect()
        )
        if not top:
            break
        batch = _bpe_pick_batch(
            top, min(batch_size, num_merges - len(merges)), len(top) == fetch
        )
        expr = F.col("t")
        for row in batch:
            merges.append((len(merges), row["left"], row["right"], row["n_pairs"]))
            expr = _bpe_fold(expr, row["left"], row["right"])
        cur = cur.select(expr.alias("t"))
        rounds += 1
        if rounds % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=False)
    merges_df = spark.createDataFrame(
        merges, "step int, left string, right string, n_pairs long"
    )
    return merges_df, cur


def bpe_apply(
    docs: DataFrame,
    merges: "list[tuple[str, str]] | DataFrame",
    text: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize with a trained BPE merge table: each rule is applied
    once, in rank order, leftmost-first non-overlapping — exactly the
    per-document effect of the :func:`bpe_train` rounds, so applying a
    model to its own training corpus reproduces the training tokens
    (test-pinned).

    ``merges`` is the (step-ordered) DataFrame from :func:`bpe_train`
    or a plain ``[(left, right), ...]`` list.

    This is the one deliberately Python stage in the retrieval family:
    rule application is an inherently sequential per-document loop no
    Catalyst expression expresses for thousands of rules (a fold per
    rule would build a plan linear in vocabulary size). It runs as an
    Arrow-batched pandas UDF — narrow, no shuffle, merge table
    broadcast in the closure (vocabularies are bounded: ~100k rules ≈
    MBs) — so it scales linearly with executors like the multimodal
    decode stage.
    """
    from pyspark.sql import functions as _F
    from pyspark.sql.functions import pandas_udf

    if isinstance(merges, DataFrame):
        rules = [
            (r["left"], r["right"])
            for r in merges.orderBy("step").select("left", "right").collect()
        ]
    else:
        rules = [(left, right) for left, right in merges]

    import re

    # EXACT replica of ws_tokens' JVM semantics, not Python str.split():
    # Java \s is [ \t\n\x0B\f\r] (U+00A0 etc. are NOT whitespace there),
    # trim strips ASCII space/control only, and blank text is []. A
    # Python .split() would tokenize Unicode whitespace differently and
    # silently break the train→apply reproducibility guarantee.
    _ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def _jvm_tokens(t: str) -> "list[str]":
        trimmed = t.lower().strip(" ")  # JVM trim strips ASCII space only
        if not trimmed:
            return []
        return _ws.split(trimmed)

    @pandas_udf("array<string>")
    def _tokenize(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            toks = _jvm_tokens(t)
            for left, right in rules:
                out = []
                for x in toks:
                    if out and out[-1] == left and x == right:
                        out[-1] = left + right
                    else:
                        out.append(x)
                toks = out
            return toks

        return texts.map(one)

    return docs.withColumn(out_col, _tokenize(_F.col(text)))


def rrf_fuse(
    rankings: "list[DataFrame]",
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (e.g. BM25 +
    embedding ANN — the standard hybrid-retrieval combiner):
    ``rrf = Σ_lists 1 / (k + rank)``. A document absent from a list
    simply contributes nothing (no imputation).

    Output: (query_id, doc_id, rrf_score[, rank]) — ``rank`` when
    ``topk`` is set, deterministically tie-broken by (score desc,
    doc_id asc).

    Scale: union + ONE keyed aggregate; re-ranking is a per-query
    window, never a global sort. Fusing is rank-based, so the two
    engines' float score scales never need reconciling — only the
    integer ranks cross lists.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(query_id), F.col(doc_id),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias("_c"),
        )
        for r in rankings
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = unioned.groupBy(query_id, doc_id).agg(
        F.sum("_c").alias("rrf_score")
    )
    if topk is None:
        return fused
    w = Window.partitionBy(query_id).orderBy(
        F.col("rrf_score").desc(), F.col(doc_id).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
    )
