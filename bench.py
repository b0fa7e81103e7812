"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing includes full execution (write-discard of every result row) —
plan build + scan + transform. Mirroring the reference's benchmark.lua
(which compiles each schema before a timed loop of 10M warm
iterations, benchmark.lua:78-123), each query first runs once
unmeasured so Catalyst analysis + Janino codegen are warm; the timed
run then measures the steady-state data path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402

# headline set: every oracle-checked operator + the LSH/IVF scale paths
BENCH_QUERIES = [
    "flatten_nested",
    "recursive_flatten",
    "unflatten_roundtrip",
    "defaults_fill",
    "evolution_reorder_rename",
    "evolution_downgrade",
    "service_fields",
    "promotions",
    "enum_codes",
    "enum_roundtrip",
    "union_encode",
    "enum_evolution",
    "union_evolution",
    "union3_encode",
    "array_evolution",
    "map_evolution",
    "fixed_passthrough",
    "xflatten_update",
    "avro_roundtrip",
    "avro_ocf_roundtrip",
    "conform",
    "csv_roundtrip",
    "compat_matrix",
    "streaming_flatten",
    "streaming_avro_decode",
    "text_stats",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "pii_redact",
    "train_split",
    "domain_mix",
    "corpus_stats",
    "repetition_stats",
    "pack_sequences",
    "winnow",
    "dedup_exact",
    "ngram_jaccard",
    "knn_bruteforce",
    "knn_pq",
    "knn_ivfpq",
    "decontaminate_emb",
    "gopher_rules",
    "minhash_lsh",
    "dedup_clusters",
    "simhash",
    "cosine_lsh",
    "embedding_clusters",
    "knn_ivf",
    "sessionize_batch",
    "union_interop",
    "curate_corpus",
    "salted_join",
    "bucketed_join",
    "media_meta",
    "multimodal_features",
    # round 2: temporal + retrieval families
    "asof_join",
    "range_join",
    "time_rollup",
    "bm25_retrieval",
    "bm25_indexed",
    "semantic_dedup",
    # round 10: multi-probe routing variant (nprobe=2)
    "semantic_dedup_multiprobe",
    "hybrid_indexed",
    "incremental_exact_dedup",
    "semantic_dedup_indexed",
    # round 10: the three-index pipeline composition
    "incremental_curation",
    "is_schema",
    "bpe_pairs",
    # round 2: corpus statistics + curation sampling
    "heavy_hitters",
    "cms_freq",
    "tfidf_topk",
    "length_quantiles",
    "stratified_sample",
    "domain_cap",
    "bigram_lm",
    "embedding_pool",
    "embedding_quantize",
    "snapshot_merge",
    "moving_stats",
    "html_clean",
    # round 3: container probes + splittable OCF reads
    "media_probe",
    "ocf_split_read",
    "xflatten_json",
    "jsonl_avro_roundtrip",
    # round 4: substring dedup + NB quality classifier
    "dup_span_removal",
    "line_dedup",
    "nb_quality",
    # round 5: width-bounded branching recursion + sized-output contract
    # + streaming OCF file source
    "branching_flatten",
    "sized_output",
    "streaming_ocf_source",
    "decontaminate_emb_arrow",
    "knn_bruteforce_arrow",
    "ocf_evolved_read",
    # r5 audit: oracle-checked gates the list had historically missed
    # round 6: persisted partition-pruned IVF index + OCF projection pushdown
    "knn_ivf_indexed",
    # round 9: persisted IVF-PQ index (codes scan + exact rerank)
    "knn_ivfpq_indexed",
    "ocf_projected_read",
    "ocf_snappy_read",
    "ocf_zstd_read",
    "ocf_mixed_writers",
    "incremental_dedup",
    # round 8: streaming face of the persisted MinHash index
    # (r9: window shape is one seed + one batch; the two-batch growth
    # face is the *2 variant)
    "streaming_incremental_dedup",
    "streaming_incremental_dedup2",
    "wire_roundtrip",
    "conform_json",
    "hidden_fields",
    "streaming_window",
    "chunk_documents",
    "decontaminate",
    "global_ids",
    "conform_errors",
    "hybrid_retrieval",
    "profile_table",
    "jsonl_roundtrip",
    "fingerprint",
    "flat_layout",
]


# Person-shaped lineitem record: scalars + nested record + enum-ish
# strings, mirroring the reference benchmark workload (benchmark.lua:3-44)
_LINEITEM_NESTED = {
    "type": "record",
    "name": "Line",
    "fields": [
        {"name": "l_orderkey", "type": "long"},
        {"name": "l_linenumber", "type": "int"},
        {"name": "amounts", "type": {
            "type": "record", "name": "Amounts",
            "fields": [
                {"name": "l_quantity", "type": "double"},
                {"name": "l_extendedprice", "type": "double"},
                {"name": "l_discount", "type": "double"},
                {"name": "l_tax", "type": "double"},
            ],
        }},
        {"name": "l_returnflag", "type": "string"},
        {"name": "l_linestatus", "type": "string"},
    ],
}


def _throughput_probes(
    spark, sf_dir: str, warm_reps: int = 1
) -> tuple[dict, dict, dict, dict, dict]:
    """rows/sec of the BASELINE.md-mapped transforms over lineitem (the
    largest driver table) and orders; warm-then-time like the queries.

    Every probe row is SELF-ATTRIBUTING (r9 VERDICT #1): the fifth
    return value maps metric → the engine route the probe's plan
    ACTUALLY took ("jvm" / "python" / "codegen" for plain narrow
    Catalyst transforms). The OCF reader records its own routing via
    ``route_out`` — re-detection could drift from the decision the read
    really made, and the r9 bench couldn't distinguish "JVM route, slow
    session" from "silent fallback to the Python codec"."""
    import time as _time

    import avro_spark
    from avro_spark.operators.conform import conform
    from avro_spark.sources.avro_binary import from_avro_bytes, to_avro_bytes
    from pyspark.sql import functions as F

    # the probes run AFTER the full query sweep: drop its cached data and
    # let the JVM compact before timing, or end-of-session memory pressure
    # bleeds into the probe numbers (r5: the python-codec probe read 133k
    # in-session vs 429k in a fresh session on the same code)
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_li = li.count()
    nested = li.select(
        "l_orderkey",
        "l_linenumber",
        F.struct("l_quantity", "l_extendedprice", "l_discount", "l_tax").alias(
            "amounts"
        ),
        "l_returnflag",
        "l_linestatus",
    )
    sch = avro_spark.create(_LINEITEM_NESTED)
    cs = avro_spark.compile(sch)
    reader = {**_LINEITEM_NESTED, "fields": list(reversed(_LINEITEM_NESTED["fields"]))}
    cs_evo = avro_spark.compile(sch, avro_spark.create(reader))
    flat = cs.flatten(nested)
    # The JVM codegen'd narrow transforms run ~2.6M rows/s on a single
    # core — no repartition (its shuffle would dominate). The Python
    # Avro codec IS CPU-bound, so it gets the parallelism the driver's
    # one-row-group parquet denies the scan (SCALE.md §7).
    # cache the repartitioned input so the codec probes time the codec, not
    # the parallelizing shuffle (the parquet scan is one row group; without
    # the repartition both codecs would run single-task)
    nested_par = nested.repartition(spark.sparkContext.defaultParallelism).cache()
    nested_par.count()
    # the avro-codec auto route is decided by these two pure checks
    # (avro_binary.to_avro_bytes:916-922) — record what auto WILL take
    from avro_spark import jvm as J

    codec_route = (
        "jvm"
        if J.jvm_codec_supported(sch) and J.jvm_codec_available(spark)
        else "python"
    )
    routes = {
        "flatten_rows_per_sec": "codegen",
        "unflatten_rows_per_sec": "codegen",
        "validate_rows_per_sec": "codegen",
        "evolution_rows_per_sec": "codegen",
        "avro_codec_rows_per_sec": codec_route,
        "avro_codec_python_rows_per_sec": "python",
    }
    probes = {
        "flatten_rows_per_sec": (cs.flatten(nested), n_li),
        "unflatten_rows_per_sec": (cs.unflatten(flat), n_li),
        "validate_rows_per_sec": (conform(nested, sch), n_li),
        "evolution_rows_per_sec": (cs_evo.flatten(nested), n_li),
        # the gated path: engine="auto" routes through the compiled JVM
        # codec (avro_spark/jvm) when available — adds ~0 over the
        # scan+shuffle floor; the Python fallback is probed separately
        "avro_codec_rows_per_sec": (
            from_avro_bytes(to_avro_bytes(nested_par, sch, "b"), "b", sch),
            n_li,
        ),
        "avro_codec_python_rows_per_sec": (
            from_avro_bytes(
                to_avro_bytes(nested_par, sch, "b", engine="python"),
                "b", sch, engine="python",
            ),
            n_li,
        ),
    }
    # general-union probe: 3-branch tagged-struct unions now run on the
    # JVM codec too (engine="auto"); this pins the path's throughput so a
    # silent fallback to the ~6× slower Python codec would show up
    u3 = {
        "type": "record",
        "name": "LineU",
        "fields": [
            {"name": "l_orderkey", "type": "long"},
            {"name": "payload", "type": ["null", "double", "string"]},
        ],
    }
    sch_u3 = avro_spark.create(u3)
    tag = (F.col("l_orderkey") % 3).cast("int")
    union_par = li.select(
        "l_orderkey",
        F.struct(
            tag.alias("$type$"),
            F.when(tag == 1, F.col("l_quantity")).alias("double"),
            F.when(tag == 2, F.col("l_returnflag")).alias("string"),
        ).alias("payload"),
    ).repartition(spark.sparkContext.defaultParallelism).cache()
    union_par.count()
    probes["avro_codec_union3_rows_per_sec"] = (
        from_avro_bytes(to_avro_bytes(union_par, sch_u3, "b"), "b", sch_u3),
        n_li,
    )
    routes["avro_codec_union3_rows_per_sec"] = (
        "jvm"
        if J.jvm_codec_supported(sch_u3) and J.jvm_codec_available(spark)
        else "python"
    )
    # OCF container probes: the engine's primary 100 TB file-ingest path.
    # Written once (JVM-encode framing), then timed reads on both engines —
    # the auto path must sit within ~2× of avro_codec_rows_per_sec (the
    # r04 `weak`: Python block decode left ~10× on the table).
    import shutil

    from avro_spark.sources.avro_ocf import read_avro_files, write_avro_files

    ocf_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "spark-warehouse", "bench_ocf"
    )
    out = {}
    errors = {}
    try:
        write_avro_files(nested_par, sch, ocf_dir)
        # the reader records the route it ACTUALLY takes (whole-file vs
        # split × jvm vs python) — the one probe whose auto-fallback is
        # silent by design, and exactly the attribution hole the r9
        # bench verdict flagged
        auto_route: dict = {}
        probes["ocf_read_rows_per_sec"] = (
            read_avro_files(spark, ocf_dir, sch, route_out=auto_route),
            n_li,
        )
        routes["ocf_read_rows_per_sec"] = auto_route.get("engine", "?")
        py_route: dict = {}
        probes["ocf_read_python_rows_per_sec"] = (
            read_avro_files(spark, ocf_dir, sch, engine="python",
                            route_out=py_route),
            n_li,
        )
        routes["ocf_read_python_rows_per_sec"] = py_route.get("engine", "?")
    except Exception as ex:  # a failed OCF write must be VISIBLE, not absent
        out["ocf_read_rows_per_sec"] = None
        errors["ocf_read_rows_per_sec"] = f"{type(ex).__name__}: {ex}"[:200]
    # OCF WRITE probe (r10): the ingest path's other half — JVM record
    # encode + JVM block compression + Python framing, timed as a full
    # overwrite of the repartitioned lineitem to local disk (each rep's
    # mode='overwrite' clears the previous rep's parts itself)
    wdir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "spark-warehouse",
        "bench_ocf_write",
    )
    w_route: dict = {}
    write_probes = {
        "ocf_write_rows_per_sec": (
            lambda: write_avro_files(nested_par, sch, wdir,
                                     route_out=w_route),
            n_li,
        ),
    }
    medians = {}
    spreads = {}
    for metric, (run, n) in write_probes.items():
        try:
            for _ in range(max(1, warm_reps)):
                run()
            dts = []
            for _ in range(3):
                t0 = _time.perf_counter()
                run()
                dts.append(_time.perf_counter() - t0)
            dts.sort()
            out[metric] = round(n / dts[0])
            medians[metric] = round(n / dts[1])
            spreads[metric] = [round(dts[0], 3), round(dts[-1], 3)]
            routes[metric] = w_route.get("engine", "?")
        except Exception as ex:
            out[metric] = None
            errors[metric] = f"{type(ex).__name__}: {ex}"[:200]
    shutil.rmtree(wdir, ignore_errors=True)
    for metric, (df, n) in probes.items():
        try:
            # warm `warm_reps` times, then 3 timed reps: the headline
            # keeps best-of (continuity with the BASELINE.md-mapped
            # numbers; JIT warmup shows 4-10× swings), and the MEDIAN +
            # min/max spread are recorded so probe drift is attributable
            # mechanically instead of by hand-waving at box load. The
            # fresh-subprocess pass warms deeper (r10): a brand-new JVM
            # needs ~4 passes before C2 compiles the decode loops
            # (measured 1.1M→5.6M rows/s over reps 0-4 on the OCF
            # read), and the reference's own protocol times WARM
            # iterations (benchmark.lua runs 10M of them) — `fresh`
            # means an unpolluted session, not a cold JIT.
            for _ in range(max(1, warm_reps)):
                df.write.format("noop").mode("overwrite").save()
            dts = []
            for _ in range(3):
                t0 = _time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                dts.append(_time.perf_counter() - t0)
            dts.sort()
            out[metric] = round(n / dts[0])
            medians[metric] = round(n / dts[1])
            spreads[metric] = [round(dts[0], 3), round(dts[-1], 3)]
        except Exception as ex:
            # a failing probe must be VISIBLE in the bench output, not a
            # silently missing key (a codec regression would otherwise
            # make the bench look healthy)
            out[metric] = None
            errors[metric] = f"{type(ex).__name__}: {ex}"[:200]
    nested_par.unpersist()
    union_par.unpersist()
    shutil.rmtree(ocf_dir, ignore_errors=True)
    return out, medians, spreads, errors, routes


def _build_session(cpus: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("avro_spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def probes_only_main() -> None:
    """``python bench.py --probes-only``: run ONLY the BASELINE.md-mapped
    throughput probes in this (fresh) session and print one JSON line.

    The r9 bench recorded ocf_read at 717k rows/s where fresh sessions
    measure 4-15M — the probes run after the 114-gate sweep, and
    end-of-session JVM state (fragmented heap, accumulated codegen
    classes) taxes them in a way clearCache+gc cannot undo (r5 measured
    a 3× python-probe delta; r9 saw 13.1M→424k between two commits that
    didn't touch the read path). The driver-recorded headline numbers
    must not depend on sweep history, so :func:`main` shells out to
    this mode and records BOTH: ``fresh`` anchors the
    BASELINE-comparison claim, ``in_session`` keeps continuity with
    r1-r9 and exposes the session tax itself."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = _build_session(cpus)
    best, medians, spreads, errors, routes = _throughput_probes(
        spark, sf_dir, warm_reps=4)
    out = {
        "rows_per_sec": best,
        "rows_per_sec_median": medians,
        "probe_spread_sec": spreads,
        "probe_routes": routes,
    }
    if errors:
        out["probe_errors"] = errors
    spark.stop()
    print(json.dumps(out, separators=(",", ":")))


def _fresh_probes() -> dict:
    """Run the throughput probes in a FRESH subprocess session; returns
    the parsed probes-only JSON (or an ``{"error": ...}`` record — a
    missing fresh pass must be visible, never silently absent)."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probes-only"],
            capture_output=True, text=True, timeout=1200,
        )
        lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
        if proc.returncode != 0 or not lines:
            return {"error": f"rc={proc.returncode}: {proc.stderr[-300:]}"}
        return json.loads(lines[-1])
    except Exception as ex:
        return {"error": f"{type(ex).__name__}: {ex}"[:300]}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = _build_session(cpus)
    # folded near-duplicate gates still get benched — they live in
    # extra_queries() outside the driver's 50-entry correctness window
    qs = {**E.queries(), **getattr(E, "extra_queries", dict)()}
    # Warm then time EACH query back-to-back (mirroring the reference
    # protocol of timing warm iterations of one compiled op at a time,
    # benchmark.lua:102-123). A warm-all-then-time-all shape is wrong on
    # Spark: the Janino generated-class cache holds ~100 classes, so by
    # the time the timed pass reaches a query its codegen has been
    # evicted by the other queries and the measurement includes seconds
    # of recompilation — observed as 3-6× noise on the largest plans.
    # Median of three timed runs (+ recorded min/max spread): AQE can
    # re-plan run-to-run, and a re-planned stage recompiles its generated
    # code (~6 s on the largest expression trees); the median is robust
    # to one such outlier AND to one ambient-load spike, and the spread
    # in bench_detail.json lets a reader separate "code got slower"
    # (median moved, tight spread) from "box was loaded" (wide spread).
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    cold: dict[str, float] = {}
    # throwaway JVM warmup: the first job of a session pays ~3 s of
    # JVM/Janino/AQE startup that has nothing to do with the query it
    # lands on (r02 showed flatten_nested cold absorbing it). One
    # codegen'd transform up front makes every cold number below mean
    # cold-CACHE, not cold-JVM.
    from pyspark.sql import functions as F

    (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .select((F.col("n_nationkey") * 2).alias("x"), F.upper("n_name").alias("u"))
        .groupBy("u").agg(F.sum("x").alias("s"))
        .write.format("noop").mode("overwrite").save()
    )
    for name in BENCH_QUERIES:
        fn = qs[name]
        # per-gate isolation (r9, VERDICT r8 #4): a previous gate's
        # cached relations must not serve this gate's scans (gate temp
        # dirs already rotate per invocation via _fresh_dirs, so no
        # on-disk state bleeds either)
        spark.catalog.clearCache()
        # the warm-up run doubles as the cold (first-run) measurement —
        # plan build + Janino compile + AQE included
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            cold[name] = round(time.perf_counter() - t0, 3)
        except Exception:
            pass
        # MEDIAN of 3 warm reps, with the spread recorded: two rounds of
        # bench deltas were attributed to "ambient box load" by hand —
        # the median + min/max makes a real regression mechanically
        # distinguishable from a loaded-box swing (a regression moves the
        # median with a tight spread; load widens the spread)
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dts.append(time.perf_counter() - t0)
        dts.sort()
        timings[name] = round(dts[1], 3)
        spread[name] = [round(dts[0], 3), round(dts[-1], 3)]
    total = round(sum(timings.values()), 3)
    cold_total = round(sum(cold.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    # BASELINE.md maps the reference's M-RPS metrics to rows/sec of the
    # equivalent DataFrame transform at the same scale factor. Dedicated
    # probes over the largest table (lineitem) amortize fixed job
    # overhead so the number reflects per-row transform throughput, not
    # scheduler latency on a 25-row table.
    rows_per_sec, probe_medians, probe_spreads, probe_errors, probe_routes = (
        _throughput_probes(spark, sf_dir)
    )
    # fresh-subprocess pass (r9 VERDICT #1): the recorded headline
    # numbers must be anchored by a session that ran NOTHING before the
    # probes — the in-session pass above keeps r1-r9 continuity and
    # measures the end-of-sweep session tax
    fresh = _fresh_probes()
    fresh_rps = fresh.get("rows_per_sec", {})
    fresh_routes = fresh.get("probe_routes", {})
    # Two-artifact protocol (r02's single line overflowed the driver's
    # tail capture and parsed as null): the full per-query record —
    # warm, cold, probes, errors — goes to bench_detail.json next to
    # this script; stdout gets ONE compact summary line, printed LAST,
    # with the driver-required keys (metric/value/unit/queries/sf) and
    # warm per-query seconds only.
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_spread": spread,
        "cold_total_sec": cold_total,
        "queries_cold": cold,
        "rows_per_sec": rows_per_sec,
        "rows_per_sec_median": probe_medians,
        "probe_spread_sec": probe_spreads,
        "probe_routes": probe_routes,
        "rows_per_sec_fresh": fresh,
        "sf": sf_val,
    }
    if probe_errors:
        detail["probe_errors"] = probe_errors
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    # Hard contract: the driver captures only the LAST ~2000 chars of
    # stdout, and r02 + r04 both overflowed it (r04's 80-query map pushed
    # the line to >2400 chars → "parsed": null). The summary line now
    # carries totals + probes + the 5 slowest queries ONLY (≈500 chars at
    # any query count); the full per-query map lives in bench_detail.json.
    top5 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )
    slowest = dict(top5)
    # never DROP a previously-reported query from the summary (the
    # per-round perf comparison keys on this dict): the round-10 line
    # carried these five, so they stay reported even when optimization
    # pushes them out of the slowest-5. Spreads stay top-5-only to hold
    # the summary line inside the driver's tail budget.
    for k in (
        "hybrid_indexed",
        "incremental_curation",
        "streaming_incremental_dedup",
        "incremental_dedup",
        "streaming_incremental_dedup2",
    ):
        if k in timings:
            slowest.setdefault(k, timings[k])
    # per-gate spread promoted into the recorded summary (r9, VERDICT r8
    # #4): max/min over the 3 warm reps per gate, aggregated to a median
    # and p90 ratio across all gates. A code regression moves the warm
    # total with these ratios tight; session noise (identical code
    # measured 97.5/120.4/128.8 s warm across three r8 sessions) shows
    # up as wide ratios — SCALE.md §6f records the expected envelope.
    ratios = sorted(
        (hi / lo if lo > 0 else 1.0) for lo, hi in spread.values()
    )
    # self-attributing probe rows (r9 VERDICT #1): every probe carries
    # [fresh, in_session, route] — `fresh` (a subprocess session that
    # ran nothing else) anchors the BASELINE comparison; `in_session`
    # keeps r1-r9 continuity; `route` says which engine the plan
    # actually took, so a silent auto-fallback is visible in the
    # recorded artifact, not just in a manual re-run
    probe_rows = {}
    for k in sorted(set(rows_per_sec) | set(fresh_rps)):
        probe_rows[k] = [
            fresh_rps.get(k),
            rows_per_sec.get(k),
            fresh_routes.get(k) or probe_routes.get(k),
        ]
    summary = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in slowest.items()},
        "queries_spread": {
            k: [round(spread[k][0], 2), round(spread[k][1], 2)]
            for k in top5
        },
        "spread_ratio_median": round(ratios[len(ratios) // 2], 3),
        "spread_ratio_p90": round(ratios[int(len(ratios) * 0.9)], 3),
        "cold_total_sec": cold_total,
        "probe_cols": ["fresh", "in_session", "route"],
        "rows_per_sec": probe_rows,
        "n_queries": len(timings),
        "detail": "bench_detail.json",
        "sf": sf_val,
    }
    if "error" in fresh:
        summary["fresh_probe_error"] = fresh["error"][:120]
    spark.stop()
    line = json.dumps(summary, separators=(",", ":"))
    assert len(line) <= 1500, f"summary line {len(line)} chars breaks the tail budget"
    print(line)


if __name__ == "__main__":
    if "--probes-only" in sys.argv[1:]:
        probes_only_main()
    else:
        main()
