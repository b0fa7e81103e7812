"""Exact duplicate-substring removal — the "dedup inside documents"
pass of a training-data pipeline.

Web-scale corpora carry exact repeated substrings (boilerplate headers,
licence blocks, navigation chrome) that survive *document*-level dedup
because the surrounding text differs. The published remedy (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", 2022) removes
every substring that occurs verbatim more than once in the corpus. Their
single-node tool builds a suffix array; a suffix array over 100 TB is not
a Spark-shaped structure, so this module implements the standard
distributed approximation at token n-gram granularity:

1. explode each document into its token ``n``-grams with start offsets —
   a narrow projection (``transform`` over ``sequence``), no Python;
2. count **distinct documents** per gram (one shuffle, map-side partial
   agg; the shuffle key is ``xxhash64(gram)`` — 8 bytes on the wire
   instead of an n-word string);
3. join the duplicated grams back (same hashed key, AQE skew-join covers
   hot boilerplate grams) and mark every token position they cover;
4. rebuild each document from its uncovered tokens with an indexed
   higher-order ``filter`` — row-local, codegen'd.

Every duplicated span of length ≥ n is removed exactly (a repeated span
of length L ≥ n is covered by its L-n+1 constituent n-grams); spans
shorter than n are below the resolution, which is the same knob as the
suffix-array tool's minimum match length (they use 50 bytes).

Scale: two shuffles total (gram count, covered-position agg), both keyed
by uniform hashes; per-doc state (``collect_set`` of covered offsets) is
bounded by document length, never by corpus size. No driver data, no
Python row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def duplicate_grams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Token ``n``-grams occurring in ≥ ``min_docs`` distinct documents.

    Returns ``(gram_key, n_docs)`` where ``gram_key = xxhash64(gram)``.
    One shuffle; the distinct-doc count is partially aggregated map-side.
    """
    grams = _gram_offsets(df, id_col, text_col, n)
    return (
        grams.groupBy("gram_key")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def _gram_offsets(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, pos, gram_key) for every token n-gram; docs shorter than n
    contribute nothing (``sequence`` would count backwards on a negative
    stop — the filter keeps it monotone)."""
    base = df.select(F.col(id_col), _tokens(text_col).alias("_toks"))
    return (
        base.where(F.size("_toks") >= n)
        .select(
            id_col,
            F.expr(
                f"explode(transform(sequence(0, size(_toks) - {n}),"
                f" i -> struct(i AS pos,"
                f" xxhash64(concat_ws(' ', slice(_toks, i + 1, {n})))"
                f" AS gram_key)))"
            ).alias("g"),
        )
        .select(id_col, "g.pos", "g.gram_key")
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Remove every token span that appears (as an exact n-gram) in
    ``min_docs`` or more distinct documents.

    Output: every input row, with

    * ``clean_text`` — the document with covered tokens removed
      (single-space rejoined; empty string when everything was
      boilerplate),
    * ``n_removed`` — how many token positions were removed.

    Duplicate-gram keys are 64-bit hashes: two distinct grams colliding
    (≈ |grams|²/2⁶⁴) could remove a non-duplicated span — the standard
    fingerprint trade every shuffle-keyed dedup in this package makes.
    """
    grams = _gram_offsets(df, id_col, text_col, n)
    dup = duplicate_grams(df, id_col, text_col, n, min_docs)
    covered = (
        grams.join(dup, "gram_key")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("_ti"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("_ti").alias("_cov"))
    )
    base = df.select(F.col(id_col), _tokens(text_col).alias("_toks"))
    return base.join(covered, id_col, "left").select(
        id_col,
        F.concat_ws(
            " ",
            F.expr(
                "filter(_toks, (t, i) ->"
                " _cov IS NULL OR NOT array_contains(_cov, i))"
            ),
        ).alias("clean_text"),
        F.coalesce(F.size("_cov"), F.lit(0)).cast("long").alias("n_removed"),
    )
