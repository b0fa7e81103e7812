"""Global exact-line dedup (functions/dedup.py line_dedup): first
occurrence wins corpus-wide, short-line exemption, order-preserving
rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from avro_spark.functions.dedup import line_dedup


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = line_dedup(df, **kw).collect()
    return {r.doc_id: (r.text, r.n_removed) for r in out}


def test_first_occurrence_wins_across_docs(spark):
    boiler = "subscribe to our newsletter today"
    docs = [
        (1, f"alpha unique line one\n{boiler}\nalpha tail line"),
        (2, f"{boiler}\nbeta unique line two"),
        (3, f"gamma unique line three\n{boiler}"),
    ]
    out = _run(spark, docs)
    assert out[1] == (docs[0][1], 0)  # doc 1 holds the first occurrence
    assert out[2] == ("beta unique line two", 1)
    assert out[3] == ("gamma unique line three", 1)


def test_duplicate_within_one_doc(spark):
    line = "repeated licence block text"
    out = _run(spark, [(7, f"{line}\nmiddle unique words\n{line}")])
    assert out[7] == (f"{line}\nmiddle unique words", 1)


def test_short_lines_exempt(spark):
    docs = [(1, "ok\nlong enough line to dedup\nok"),
            (2, "ok\nlong enough line to dedup")]
    out = _run(spark, docs, min_chars=10)
    # "ok" (and the blank-ish short lines) survive everywhere
    assert out[1] == ("ok\nlong enough line to dedup\nok", 0)
    assert out[2] == ("ok", 1)


def test_doc_fully_boilerplate_comes_back_empty(spark):
    line = "identical boilerplate everywhere"
    out = _run(spark, [(1, line), (2, line)])
    assert out[1] == (line, 0)
    assert out[2] == ("", 1)


def test_order_preserved_after_removal(spark):
    dup = "duplicated navigation chrome"
    text = f"first content line here\n{dup}\nsecond content line here\nthird content line here"
    out = _run(spark, [(1, f"{dup}\nearlier doc owns the line")] + [(2, text)])
    assert out[2][0] == (
        "first content line here\nsecond content line here\nthird content line here"
    )


def test_md5_and_xxhash_paths_agree(spark):
    docs = [
        (1, "shared line of boilerplate text\nunique to doc one"),
        (2, "shared line of boilerplate text\nunique to doc two"),
        (3, "blank\n\nshared line of boilerplate text"),
    ]
    a = _run(spark, docs)
    b = _run(spark, docs, hash_fn=F.md5)
    assert a == b


# ---------------------------------------------------------------------------
# property: engine result == pure-Python simulation


def _py_line_dedup(docs, min_chars=10):
    """Reference implementation: global first-occurrence-wins."""
    seen = set()
    out = {}
    for doc_id, text in sorted(docs):
        kept, removed = [], 0
        for line in text.split("\n"):
            if len(line.strip()) < min_chars:
                kept.append(line)
                continue
            if line in seen:
                removed += 1
            else:
                seen.add(line)
                kept.append(line)
        out[doc_id] = ("\n".join(kept), removed)
    return out


def test_line_dedup_matches_python_reference(spark):
    import random

    rng = random.Random(11)
    pool = [
        f"shared boilerplate line number {i} with enough characters"
        for i in range(6)
    ] + ["ok", "", "  ", "tiny"]
    docs = []
    for doc_id in range(20):
        n = rng.randint(0, 6)
        lines = [rng.choice(pool) for _ in range(n)]
        # sprinkle unique content
        if rng.random() < 0.7:
            lines.insert(
                rng.randint(0, len(lines)),
                f"unique content for document {doc_id} only",
            )
        docs.append((doc_id, "\n".join(lines)))
    got = _run(spark, docs)
    want = _py_line_dedup(docs)
    assert got == want


def test_null_text_doc_still_emits_a_row(spark):
    # split(NULL) is NULL and posexplode drops NULL arrays — without the
    # coalesce a NULL-text document vanished from the output entirely,
    # breaking the "one row per input document" contract
    docs = [
        (1, "real content line long enough to be eligible"),
        (2, None),
        (3, ""),
    ]
    out = _run(spark, docs)
    assert set(out) == {1, 2, 3}
    assert out[2] == ("", 0)  # NULL normalizes to the empty document
    assert out[3] == ("", 0)
