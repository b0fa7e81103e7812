"""Scaling-behavior probe: run the heavy extension pipelines at 1×/4×/16×
synthetic data multiples and report wall time + derived rows/sec, as
evidence the plans scale sub-quadratically (SCALE.md).

Each multiple unions perturbed copies of the documents/embeddings tables
(ids offset; texts get a per-copy suffix token so cross-copy near-dup
pairs do NOT explode quadratically — the workload is meant to grow
linearly, mirroring a larger corpus rather than a more duplicated one).

Usage: python tools/scale_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def multiplied_docs(docs, mult: int):
    """Each copy appends ~60 filler tokens unique to that (copy, doc), so
    no two rows anywhere share filler shingles: Jaccard between any pair
    involving a copy stays < 0.5 (a doc's own copies share only the
    original m tokens → m/(m+120) < 0.5 always). The probe thus measures
    corpus-size scaling of the signature/banding/verify machinery with
    pair output held near zero — output-pair volume is a property of the
    corpus, not of the engine."""
    def make_filler(i: int):
        # factory, not default-arg capture: F.transform counts lambda
        # parameters, so the lambda must stay single-arg
        prefix = f"cp{i}d"
        return F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(60)),
                lambda j: F.concat(
                    F.lit(prefix),
                    F.col("doc_id").cast("string"),
                    F.lit("t"),
                    j.cast("string"),
                ),
            ),
        )

    parts = []
    for i in range(mult):
        filler = make_filler(i)
        parts.append(
            docs.select(
                (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" "), filler).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def multiplied_emb(emb, mult: int):
    parts = [
        emb.select(
            (F.col("vec_id") + 1_000_000 * i).alias("vec_id"), "embedding"
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def multiplied_events(ev, mult: int):
    """Copies shift user_id so the corpus grows by USERS (the 100 TB
    shape: more keys, same per-key event density), keeping join-key
    cardinality linear in the multiple."""
    parts = [
        ev.select(
            (F.col("event_id") + 10_000_000 * i).alias("event_id"),
            "ts",
            (F.col("user_id") + 1_000_000 * i).alias("user_id"),
            "event_type",
            "value",
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from avro_spark.functions import dedup as D
    from avro_spark.functions import similarity as S

    docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb0 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    par = spark.sparkContext.defaultParallelism

    for mult in (1, 4, 16):
        docs = multiplied_docs(docs0, mult).repartition(par).localCheckpoint(eager=True)
        emb = multiplied_emb(emb0, mult).repartition(par).localCheckpoint(eager=True)
        n_docs = docs.count()
        n_emb = emb.count()
        results = {}

        t0 = time.perf_counter()
        n_pairs = D.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, threshold=0.5
        ).count()
        results["minhash_lsh"] = (time.perf_counter() - t0, n_pairs)

        t0 = time.perf_counter()
        n_groups = D.exact_dedup_groups(docs, "doc_id", "text").count()
        results["exact_dedup"] = (time.perf_counter() - t0, n_groups)

        t0 = time.perf_counter()
        n_sim = D.simhash_pairs(docs, "doc_id", "text", max_hamming=3).count()
        results["simhash"] = (time.perf_counter() - t0, n_sim)

        queries = emb0.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        )
        t0 = time.perf_counter()
        n_knn = S.knn_bruteforce(emb, queries, k=5).count()
        results["knn_bruteforce"] = (time.perf_counter() - t0, n_knn)

        # PQ: codebooks once (driver-side, 16 rows), then encode+score
        # the multiplied table — the compressed-candidate ANN path
        books = S.pq_codebooks(emb0, m=8, k=16)
        t0 = time.perf_counter()
        n_pq = S.knn_pq(emb, queries, books, k=5).count()
        results["knn_pq"] = (time.perf_counter() - t0, n_pq)

        cents = S.sample_centroids(emb0, 16)
        t0 = time.perf_counter()
        n_ivfpq = S.knn_ivfpq(emb, queries, cents, books, k=5, nprobe=4).count()
        results["knn_ivfpq"] = (time.perf_counter() - t0, n_ivfpq)

        # global exact-line dedup over the multiplied corpus (the filler
        # suffix lives on the LAST line of each doc, so cross-copy line
        # dups are exactly the original corpus's shared lines)
        t0 = time.perf_counter()
        n_ld = (
            D.line_dedup(docs)
            .agg(F.sum("n_removed"), F.count("*"))
            .collect()[0][1]
        )
        results["line_dedup"] = (time.perf_counter() - t0, n_ld)

        from avro_spark.functions import retrieval as R
        from avro_spark.functions import stats as ST

        t0 = time.perf_counter()
        # consume n_bigrams so Catalyst cannot eliminate the score join
        # (a bare count() on the unique-key left join would)
        n_lm = ST.bigram_lm_scores(docs).agg(
            F.sum("n_bigrams"), F.count("*")
        ).collect()[0][1]
        results["bigram_lm"] = (time.perf_counter() - t0, n_lm)

        qdf = spark.createDataFrame(
            [(1, "hash join"), (2, "window merge batch"), (3, "vector scan")],
            "query_id long, query string",
        )
        t0 = time.perf_counter()
        n_bm = R.bm25_topk(docs, qdf, k=10).count()
        results["bm25_topk"] = (time.perf_counter() - t0, n_bm)

        # --- temporal + merge families (round-3 probe extension) ---
        from avro_spark.operators.merge import merge_snapshot
        from avro_spark.operators.temporal import asof_join, range_join

        ev = (
            multiplied_events(
                spark.read.parquet(f"{sf_dir}/events.parquet"), mult
            )
            .repartition(par)
            .localCheckpoint(eager=True)
        )
        clicks = ev.where(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        purchases = ev.where(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("pts"), F.col("value").alias("amount")
        )
        t0 = time.perf_counter()
        n_asof = asof_join(
            clicks, purchases, on="user_id", left_ts="ts", right_ts="pts"
        ).count()
        results["asof_join"] = (time.perf_counter() - t0, n_asof)

        # hour-long per-user sessions as the interval side
        intervals = ev.where(F.col("event_type") == "signup").select(
            "user_id",
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
        )
        t0 = time.perf_counter()
        n_range = range_join(
            clicks, intervals, on="user_id", left_ts="ts"
        ).count()
        results["range_join"] = (time.perf_counter() - t0, n_range)

        base = ev.select(
            "event_id", "user_id", "value", F.lit(0).alias("version")
        )
        changes = (
            ev.where(F.col("event_id") % 5 == 0)
            .select(
                "event_id",
                "user_id",
                (F.col("value") * 2).alias("value"),
                F.lit(1).alias("version"),
                F.when(F.col("event_id") % 10 == 0, F.lit("upsert"))
                .otherwise(F.lit("delete"))
                .alias("op"),
            )
        )
        t0 = time.perf_counter()
        n_merge = merge_snapshot(base, changes, key="event_id").count()
        results["snapshot_merge"] = (time.perf_counter() - t0, n_merge)

        # one HUGE OCF file: whole-file read (1 task) vs byte-range
        # splits — the read_avro_files_split parallelism win
        import shutil
        import tempfile

        from avro_spark.sources.avro_ocf import read_avro_files, write_avro_files
        from avro_spark.schema import create as _create

        ocf_sch = _create({
            "type": "record", "name": "Ev",
            "fields": [
                {"name": "event_id", "type": "long"},
                {"name": "user_id", "type": "long"},
                {"name": "value", "type": "double"},
                {"name": "event_type", "type": "string"},
            ],
        })
        ocf_dir = tempfile.mkdtemp(prefix="scale_ocf_")
        try:
            write_avro_files(
                ev.select("event_id", "user_id", "value", "event_type")
                .repartition(1),
                ocf_sch, ocf_dir,
            )
            t0 = time.perf_counter()
            n1 = read_avro_files(spark, ocf_dir, ocf_sch).count()
            results["ocf_read_whole"] = (time.perf_counter() - t0, n1)
            t0 = time.perf_counter()
            n2 = read_avro_files(
                spark, ocf_dir, ocf_sch, split_bytes=4 << 20
            ).count()
            results["ocf_read_split4mb"] = (time.perf_counter() - t0, n2)
        finally:
            shutil.rmtree(ocf_dir, ignore_errors=True)

        print(f"-- mult={mult} docs={n_docs} emb={n_emb} events={ev.count()}")
        for name, (dt, n_out) in results.items():
            print(f"   {name:15s} {dt:6.2f}s  out_rows={n_out}")

    spark.stop()


if __name__ == "__main__":
    main()
