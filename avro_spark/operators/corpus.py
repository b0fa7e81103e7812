"""End-to-end training-corpus curation: the composition a user of this
engine actually runs at 100 TB, as one call.

    raw documents
      → language filter            (narrow)
      → quality floor              (narrow)
      → PII redaction              (narrow)
      → exact dedup (keep min id)  (1 shuffle on content fingerprint)
      → optional near-dedup        (MinHash-LSH pairs → connected
                                    components → keep cluster min)
      → deterministic split        (narrow)

Every stage is one of the already-tested operators from
:mod:`avro_spark.functions`; this module only composes them, so the
scale analysis of each stage (SCALE.md §3-5) carries over unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dedup as D
from ..functions import text as X
from ..functions.sampling import deterministic_split


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: Optional[str] = None,
    languages: Optional[Sequence[str]] = None,
    min_quality: float = 0.0,
    redact: bool = True,
    near_dedup_threshold: Optional[float] = None,
    split_weights: Sequence[int] = (80, 10, 10),
    split_labels: Sequence[str] = ("train", "val", "test"),
    hash_fn=None,
) -> DataFrame:
    """Curated corpus: (id, clean_text, lang?, quality, split).

    ``languages`` filters on ``lang_col`` when given, else on the
    n-gram language-ID heuristic. ``near_dedup_threshold`` enables the
    MinHash-LSH near-dup stage (None = exact dedup only — the variant
    whose semantics are fully expressible in one SQL statement, used by
    the oracle-checked driver query). ``hash_fn`` feeds both the split
    bucketing and the near-dup stage (default xxhash64; pass
    ``dedup.portable_hash60`` for SQL parity)."""
    out = docs
    if languages:
        lang_expr = (
            F.col(lang_col) if lang_col else X.language_id(F.col(text_col))
        )
        out = out.withColumn("_lang", lang_expr).where(
            F.col("_lang").isin(*languages)
        )
    out = out.withColumn("quality", X.quality_score(F.col(text_col)))
    if min_quality > 0.0:
        out = out.where(F.col("quality") >= min_quality)
    clean = X.redact_pii(F.col(text_col)) if redact else F.col(text_col)
    out = out.withColumn("clean_text", clean)
    # exact + near dedup on the *clean* text via the TESTED operators —
    # inline re-implementations here had already drifted from them once
    out = D.exact_dedup(out, id_col, "clean_text")
    if near_dedup_threshold is not None:
        out = D.near_dedup(
            out, id_col, "clean_text",
            threshold=near_dedup_threshold,
            hash_fn=hash_fn or F.xxhash64,
        )
    out = deterministic_split(
        out, id_col, weights=split_weights, labels=split_labels, hash_fn=hash_fn
    )
    cols = [F.col(id_col), F.col("clean_text"), F.col("quality"), F.col("split")]
    if languages:
        cols.insert(1, F.col("_lang").alias("lang"))
    return out.select(*cols)
