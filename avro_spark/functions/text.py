"""Text-analysis operators for large-scale training-data pipelines.

All functions return Column expressions built exclusively from JVM-side
``pyspark.sql.functions`` — no Python UDFs on the hot path. Every operator is
a narrow per-row projection: at 100 TB these run at scan speed with no
shuffle, and Catalyst prunes unused ones.

Provided (BASELINE.json north star "text analysis"):

* token counting — whitespace tokens and a BPE-ish regex token proxy
* language identification — stopword-hit n-gram heuristic (argmax over
  per-language marker-token counts)
* quality scoring — length / punctuation / stopword / digit ratios combined
  into a [0,1] score
* document fingerprinting — md5 of whitespace-normalized lowered text (an
  order-sensitive content hash; the rolling-hash analogue)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small disjoint marker sets per language (expand freely; keep disjoint so
# the argmax is well-defined for the oracle).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "les", "et", "est", "dans", "pour"),
    "es": ("el", "los", "y", "es", "para", "como"),
}

#: deterministic tie-break order (first wins ties)
LANG_ORDER = ("en", "de", "fr", "es")


def let(value: Column, body) -> Column:
    """Bind ``value`` once as a lambda variable and apply ``body`` to it.

    Spark inlines sub-expression trees at every reference site (even through
    CollapseProject), so an expression like the token split used N times
    evaluates N times per row. Wrapping it as the element of a 1-element
    array and referencing it through the transform lambda variable forces a
    single evaluation.
    """
    return F.transform(F.array(value), body).getItem(0)


def ws_tokens(text: Column) -> Column:
    """Whitespace-token array (empty array for empty/blank text)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(text))


def regex_token_count(text: Column, pattern: str = "[a-z]+") -> Column:
    """BPE-ish token-count proxy: number of lowercase-letter runs (a stable,
    regex-engine-portable stand-in for subword token counts)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), F.lit(0)))


def _member_pred(words: tuple[str, ...]):
    """Single-arg lambda factory (F.filter counts lambda parameters, so
    default-arg capture is not allowed)."""
    return lambda t: t.isin(*words)


def lang_scores(text: Column) -> dict[str, Column]:
    toks = ws_tokens(F.lower(text))
    return {
        lang: F.size(F.filter(toks, _member_pred(words)))
        for lang, words in LANG_MARKERS.items()
    }


def language_id(text: Column) -> Column:
    """Argmax language over marker-token hit counts; ties resolve in
    LANG_ORDER; zero hits everywhere → 'und' (undetermined).

    The token array binds once via :func:`let`; argmax is array_max over
    (score, -order, lang) structs — one filter pass per language, no
    duplicated when/otherwise subtrees."""

    def pick(t: Column) -> Column:
        scored = F.array(
            *[
                F.struct(
                    F.size(F.filter(t, _member_pred(LANG_MARKERS[lang]))).alias("s"),
                    F.lit(-i).alias("negord"),
                    F.lit(lang).alias("lang"),
                )
                for i, lang in enumerate(LANG_ORDER)
            ]
        )
        best = F.array_max(scored)
        return F.when(best["s"] > 0, best["lang"]).otherwise(F.lit("und"))

    return let(ws_tokens(F.lower(text)), pick)


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))


def digit_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = ws_tokens(F.lower(text))
    hits = F.size(F.filter(toks, _member_pred(LANG_MARKERS[lang])))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: favors mid-length docs with low
    punctuation/digit noise and a sane mean word length. Deterministic,
    portable arithmetic (reproducible in ANSI SQL for the oracle)."""
    n_chars = F.length(text).cast("double")
    n_toks = token_count(text).cast("double")
    mean_wl = F.when(n_toks > 0, (n_chars - (n_toks - 1)) / n_toks).otherwise(F.lit(0.0))
    len_term = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    punct_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.lit(5.0) * punct_count(text) / F.greatest(n_chars, F.lit(1.0))
    )
    digit_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.lit(5.0) * digit_count(text) / F.greatest(n_chars, F.lit(1.0))
    )
    wl_term = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        F.lit(0.4) * len_term + F.lit(0.2) * punct_term + F.lit(0.2) * digit_term + F.lit(0.2) * wl_term,
        6,
    )


def normalize_text(text: Column) -> Column:
    """Lowercase + collapse runs of whitespace to single spaces + trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def doc_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 hex of the normalized text."""
    return F.md5(normalize_text(text))


# PII patterns: no lookarounds/backrefs so Java regex (Spark) and RE2
# (DuckDB) match identically
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-\s]{7,}[0-9]"


def redact_pii(
    text: Column, email_token: str = "<EMAIL>", phone_token: str = "<PHONE>"
) -> Column:
    """Replace email addresses and phone-number-shaped digit runs with
    placeholder tokens — the standard pre-training scrub pass. Narrow,
    codegen'd regexp_replace (global in both Spark and DuckDB-with-'g')."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, email_token), PHONE_RE, phone_token
    )


def dup_token_fraction(text: Column) -> Column:
    """1 - |distinct tokens| / |tokens| (0.0 for empty text) — the
    repetition signal used by Gopher/C4-style quality filters."""

    def frac(t: Column) -> Column:
        n = F.size(t)
        return F.when(
            n > 0,
            F.lit(1.0) - F.size(F.array_distinct(t)).cast("double") / n.cast("double"),
        ).otherwise(F.lit(0.0))

    return let(ws_tokens(F.lower(text)), frac)


def top_bigram_fraction(text: Column) -> Column:
    """Fraction of word bigrams taken by the single most frequent bigram
    (0.0 when fewer than 2 tokens). Pure-array formulation — O(b·d) per
    row with d = distinct bigrams; fine for document-sized rows. For
    book-length rows use an explode + groupBy count instead (same
    values, shuffle on (doc, bigram))."""

    def over_tokens(t: Column) -> Column:
        bg = F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(t) - 1, F.lit(1))),
            lambda i: F.concat_ws(
                " ",
                F.element_at(t, i.cast("int")),
                F.element_at(t, (i + 1).cast("int")),
            ),
        )

        def over_bigrams(b: Column) -> Column:
            top = F.array_max(
                F.transform(
                    F.array_distinct(b),
                    lambda g: F.size(F.filter(b, lambda x: x == g)),
                )
            )
            return top.cast("double") / F.size(b).cast("double")

        return F.when(
            F.size(t) >= 2, let(bg, over_bigrams)
        ).otherwise(F.lit(0.0))

    return let(ws_tokens(F.lower(text)), over_tokens)


def winnow_fingerprints(text: Column, k: int = 5, w: int = 4, hash_fn=None) -> Column:
    """Winnowing fingerprint set (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    hash every character ``k``-gram of the normalized text, slide a
    ``w``-wide window over the hash sequence, keep each window's minimum,
    dedupe. Guarantees: any shared substring of length ≥ k+w-1 between
    two documents yields a shared fingerprint — the partial-overlap
    detector that whole-document hashes (:func:`doc_fingerprint`) and
    set-Jaccard shingles can't express.

    Pure narrow column expression (sequence/transform/slice/array_min):
    O(len·w) per row, no shuffle; fingerprints are ascending-sorted for
    deterministic output. Texts shorter than ``k`` get an empty set.
    ``hash_fn`` is the gram hash (default ``xxhash64``; pass
    ``dedup.portable_hash60`` for SQL-oracle parity).
    """
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    if hash_fn is None:
        hash_fn = F.xxhash64

    empty = F.array().cast("array<bigint>")

    def build(t: Column) -> Column:
        n_grams = F.length(t) - (k - 1)
        # sequence(1, 0) counts DOWN in Spark — guard short texts to an
        # empty gram list instead
        hashes = F.when(
            n_grams >= 1,
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: hash_fn(t.substr(i, F.lit(k))),
            ),
        ).otherwise(F.array().cast("array<bigint>"))

        # hash array let-bound: the window mins below reference it
        # w×; inlined it would recompute the k-gram hashing per window
        def over_hashes(h: Column) -> Column:
            n_windows = F.size(h) - (w - 1)

            def win_min(i: Column) -> Column:
                # least() over w in-bounds element_ats — no per-window
                # array allocation (slice+array_min measured ~20% slower
                # on the same data)
                return F.least(
                    *[F.element_at(h, (i + j).cast("int")) for j in range(w)]
                )

            mins = F.when(
                F.size(h) >= w,
                F.transform(F.sequence(F.lit(1), F.greatest(n_windows, F.lit(1))), win_min),
            ).otherwise(
                # fewer than w hashes → one window over what exists
                F.array(F.array_min(h))
            )
            return F.when(
                F.size(h) >= 1, F.array_sort(F.array_distinct(mins))
            ).otherwise(empty)

        return let(hashes, over_hashes)

    return let(normalize_text(text), build)


# ------------------------------------------------------------------ chunking
def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    max_tokens: int = 512,
    overlap: int = 0,
):
    """Split documents into token-budget chunks with optional overlap — the
    standard pre-training/RAG preparation step. One output row per chunk:
    ``(id_col, chunk_no int, n_tokens int, chunk string)``.

    Whitespace tokens; window starts step by ``max_tokens - overlap``; the
    final window may be short; empty/blank docs produce no rows. All
    JVM-side higher-order functions (``slice`` over the let-bound token
    array + ``posexplode``) — a narrow transform: at 100 TB chunking runs
    at scan speed with no shuffle, and the output explodes rows without
    ever materializing per-document state.
    """
    from pyspark.sql import functions as F

    if max_tokens <= 0 or not (0 <= overlap < max_tokens):
        raise ValueError("need max_tokens > 0 and 0 <= overlap < max_tokens")
    step = max_tokens - overlap

    def build(toks: Column) -> Column:
        n = F.size(toks)
        # 1 chunk for any non-empty doc, plus one per full step beyond the
        # first window: 1 + ceil((n - max_tokens) / step)
        extra = F.greatest(
            F.lit(0), F.floor((n - F.lit(max_tokens) + step - 1) / step)
        )
        # coalesce: size(NULL text's token array) is NULL, and a NULL
        # n <= 0 guard falls through to the otherwise() branch — a NULL
        # document would emit one phantom empty chunk
        n_chunks = (
            F.when(F.coalesce(n, F.lit(0)) <= 0, F.lit(0))
            .otherwise(extra + 1)
            .cast("int")
        )
        starts = F.sequence(F.lit(0), (n_chunks - 1) * step, F.lit(step))
        windows = F.transform(
            starts,
            lambda s: F.slice(toks, (s + 1).cast("int"), max_tokens),
        )
        return F.when(n_chunks > 0, windows).otherwise(
            F.array().cast("array<array<string>>")
        )

    chunks = df.select(
        F.col(id_col),
        F.posexplode(let(ws_tokens(F.col(text_col)), build)).alias("chunk_no", "_w"),
    )
    return chunks.select(
        id_col,
        "chunk_no",
        F.size("_w").alias("n_tokens"),
        F.concat_ws(" ", F.col("_w")).alias("chunk"),
    )


# ------------------------------------------------------- web-ingest front end
# C4-style HTML → text: drop script/style blocks, strip tags, decode the
# common entities, collapse whitespace. Pure regexp_replace chain —
# RE2-compatible (no backreferences), so a SQL oracle can replicate it
# verbatim. This is a text-extraction heuristic, not an HTML parser:
# malformed markup degrades to leftover text, never an error.
_HTML_STEPS: "list[tuple[str, str]]" = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
]
_ENTITY_STEPS: "list[tuple[str, str]]" = [
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
]


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML fragment (tags/scripts/styles removed,
    common entities decoded, whitespace collapsed)."""
    out = html
    for pat, rep in _HTML_STEPS + _ENTITY_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


_DOMAIN_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)"


def url_domain(url: Column) -> Column:
    """Lowercased host part of a URL (scheme and credentials optional);
    empty string when nothing host-like is present. The per-domain key
    for cap_per_group / domain dedup."""
    return F.lower(F.regexp_extract(url, _DOMAIN_RE, 1))


def blocklist_ratio(text: Column, words: "tuple[str, ...]") -> Column:
    """Fraction of lowercase whitespace tokens that are in ``words`` —
    the C4 "bad words" filter statistic (0.0 for empty docs)."""
    wl = tuple(w.lower() for w in words)
    return let(ws_tokens(F.lower(text)), lambda t: F.when(
        F.size(t) == 0, F.lit(0.0)
    ).otherwise(F.size(F.filter(t, _member_pred(wl))) / F.size(t)))


# ---------------------------------------------------------------------------
# Gopher-style corpus quality rules (Rae et al. 2021, "Scaling Language
# Models: ..." — the public repetition/format filters adopted by most open
# LLM-data pipelines). Every metric is a narrow codegen'd expression over
# the text column (no shuffle, no Python), so the filter runs at scan speed
# and composes with predicate pushdown at 100 TB.

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
) -> "dict[str, Column]":
    """Per-document Gopher rule metrics + composite ``keep`` flag.

    Rules (keep iff ALL hold):
      * ``min_words <= n_words <= max_words``
      * mean word length in [3, 10]
      * symbol-to-word ratio (``#`` or ``...``) <= 0.1
      * <= 90% of lines start with a bullet (``-``, ``*``, ``•``)
      * <= 30% of lines end with an ellipsis
      * >= 80% of words contain an alphabetic character
      * >= 2 distinct stop words present

    Deterministic, ANSI-reproducible arithmetic: every ratio is a quotient
    of exact integer counts, so the DuckDB oracle computes bit-identical
    doubles."""
    toks = ws_tokens(text)
    ltoks = ws_tokens(F.lower(text))
    lines = F.split(text, "\n")
    n_words = F.size(toks)
    n_lines = F.size(lines)
    sum_wl = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_wl = F.when(
        n_words > 0, sum_wl.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(text, F.lit(r"\.\.\."), 0))
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis).cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    n_bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    bullet_frac = F.when(
        n_lines > 0, n_bullet.cast("double") / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    n_ell_end = F.size(F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
    ellipsis_frac = F.when(
        n_lines > 0, n_ell_end.cast("double") / n_lines.cast("double")
    ).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_frac = F.when(
        n_words > 0, n_alpha.cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            ltoks, F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
        )
    )
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_wl >= 3.0)
        & (mean_wl <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return {
        "n_words": n_words.cast("long"),
        "mean_word_len": F.round(mean_wl, 6),
        "symbol_ratio": F.round(symbol_ratio, 6),
        "bullet_line_frac": F.round(bullet_frac, 6),
        "ellipsis_line_frac": F.round(ellipsis_frac, 6),
        "alpha_word_frac": F.round(alpha_frac, 6),
        "stop_hits": stop_hits.cast("int"),
        "keep": keep,
    }
