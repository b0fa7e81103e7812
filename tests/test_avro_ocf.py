"""Avro Object Container File source/sink tests: byte-level round-trips
(null + deflate codecs), Spark read/write round-trips against parquet
testdata, schema peeking, and third-party readability via a hand-rolled
block walk."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import avro_spark as avs
from avro_spark.errors import AvroSparkError
from avro_spark.sources.avro_ocf import (
    read_avro_files,
    read_ocf_bytes,
    write_avro_files,
    write_ocf_bytes,
)

NATION = {
    "type": "record",
    "name": "Nation",
    "fields": [
        {"name": "n_nationkey", "type": "int"},
        {"name": "n_name", "type": "string"},
        {"name": "n_regionkey", "type": "int"},
    ],
}


class TestOcfBytes:
    def test_roundtrip_null_codec(self):
        s = avs.create(NATION)
        recs = [
            {"n_nationkey": i, "n_name": f"N{i}", "n_regionkey": i % 5}
            for i in range(10)
        ]
        blob = write_ocf_bytes(s, recs)
        assert blob[:4] == b"Obj\x01"
        s2, got = read_ocf_bytes(blob)
        assert got == recs
        assert s2.fingerprint() == s.fingerprint()

    def test_roundtrip_deflate(self):
        s = avs.create(NATION)
        recs = [
            {"n_nationkey": i, "n_name": "x" * 50, "n_regionkey": 0}
            for i in range(100)
        ]
        plain = write_ocf_bytes(s, recs, codec="null")
        packed = write_ocf_bytes(s, recs, codec="deflate")
        assert len(packed) < len(plain) / 2  # repetitive strings compress
        _, got = read_ocf_bytes(packed)
        assert got == recs

    def test_multi_block(self):
        s = avs.create(NATION)
        recs = [
            {"n_nationkey": i, "n_name": str(i), "n_regionkey": 0} for i in range(25)
        ]
        blob = write_ocf_bytes(s, recs, block_records=7)  # 4 blocks
        _, got = read_ocf_bytes(blob)
        assert got == recs

    def test_bad_magic(self):
        with pytest.raises(AvroSparkError, match="magic"):
            read_ocf_bytes(b"PAR1xxxx")

    def test_empty_file_no_blocks(self):
        s = avs.create(NATION)
        blob = write_ocf_bytes(s, [])
        s2, got = read_ocf_bytes(blob)
        assert got == [] and s2.fingerprint() == s.fingerprint()


class TestOcfSpark:
    def test_spark_write_read_roundtrip(self, spark, sf_dir, tmp_path):
        s = avs.create(NATION)
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            F.col("n_nationkey").cast("int"),
            "n_name",
            F.col("n_regionkey").cast("int"),
        )
        out = str(tmp_path / "nation_avro")
        summaries = write_avro_files(nation.repartition(3), s, out)
        assert sum(x["n_records"] for x in summaries) == nation.count()
        assert all(x["file"].endswith(".avro") for x in summaries)

        back = read_avro_files(spark, out, s)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))

    def test_spark_read_peeks_writer_schema(self, spark, sf_dir, tmp_path):
        s = avs.create(NATION)
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            F.col("n_nationkey").cast("int"),
            "n_name",
            F.col("n_regionkey").cast("int"),
        )
        out = str(tmp_path / "nation_avro2")
        write_avro_files(nation, s, out, codec="deflate")
        back = read_avro_files(spark, out)  # schema=None → peek from header
        assert back.columns == ["n_nationkey", "n_name", "n_regionkey"]
        assert back.count() == nation.count()

    def test_nested_record_roundtrip(self, spark, tmp_path):
        schema = avs.create(
            {
                "type": "record",
                "name": "Doc",
                "fields": [
                    {"name": "id", "type": "long"},
                    {
                        "name": "meta",
                        "type": {
                            "type": "record",
                            "name": "Meta",
                            "fields": [
                                {"name": "lang", "type": "string"},
                                {"name": "score", "type": "double"},
                            ],
                        },
                    },
                    {"name": "tags", "type": {"type": "array", "items": "string"}},
                ],
            }
        )
        df = spark.createDataFrame(
            [(1, ("en", 0.5), ["a", "b"]), (2, ("de", 0.25), [])],
            schema.to_struct_type(),
        )
        out = str(tmp_path / "docs_avro")
        write_avro_files(df, schema, out)
        back = read_avro_files(spark, out, schema)
        assert sorted(map(str, back.collect())) == sorted(map(str, df.collect()))


# ------------------------------------------------- review-fix regressions
def test_write_files_column_order_independent(spark, tmp_path):
    """Columns must bind BY NAME — a reordered DataFrame once zipped
    positionally against schema order and swapped the data."""
    sch = avs.create({"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]})
    df = spark.createDataFrame([("hello", 7)], "b string, a long")
    write_avro_files(df, sch, str(tmp_path / "o1"))
    _, recs = read_ocf_bytes(
        open(next((tmp_path / "o1").glob("part-*.avro")), "rb").read()
    )
    assert recs == [{"a": 7, "b": "hello"}]


def test_write_files_overwrite_clears_stale_parts(spark, tmp_path):
    sch = avs.create({"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"}]})
    d = str(tmp_path / "o2")
    write_avro_files(spark.range(10).select(F.col("id").alias("a")).repartition(4), sch, d)
    n4 = len(list((tmp_path / "o2").glob("part-*.avro")))
    write_avro_files(spark.range(3).select(F.col("id").alias("a")).repartition(1), sch, d)
    files = list((tmp_path / "o2").glob("part-*.avro"))
    assert len(files) < n4  # stale parts removed
    total = sum(len(read_ocf_bytes(open(f, "rb").read())[1]) for f in files)
    assert total == 3
    import pytest as _pytest

    with _pytest.raises(Exception, match="target not empty"):
        write_avro_files(spark.range(1).select(F.col("a") if False else F.col("id").alias("a")), sch, d, mode="error")


def test_nan_roundtrips_nonnullable_double(spark, tmp_path):
    sch = avs.create({"type": "record", "name": "R", "fields": [
        {"name": "d", "type": "double"}]})
    df = spark.createDataFrame([(float("nan"),), (1.5,)], "d double").coalesce(1)
    write_avro_files(df, sch, str(tmp_path / "o3"))
    recs = []
    for f in (tmp_path / "o3").glob("part-*.avro"):
        recs += read_ocf_bytes(open(f, "rb").read())[1]
    vals = [r["d"] for r in recs]
    assert len(vals) == 2 and 1.5 in vals
    assert sum(1 for v in vals if v != v) == 1  # NaN survived


def test_corrupt_block_header_raises_avro_error(spark):
    sch = avs.create({"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"}]})
    blob = write_ocf_bytes(sch, [{"a": 1}])
    # truncate mid block header
    import pytest as _pytest

    with _pytest.raises(Exception, match="corrupt OCF|truncated"):
        read_ocf_bytes(blob[: len(blob) - 18] + b"\xfe\xff")


# ------------------------------------------------ splittable reads (round 3)
class TestSplittableRead:
    SCHEMA = {
        "type": "record",
        "name": "S",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "payload", "type": "bytes"},
        ],
    }

    def _write(self, spark, tmp_path, n=2000, codec="null", parts=2,
               payload=None):
        from avro_spark.sources.avro_ocf import write_avro_files

        sch = avs.create(self.SCHEMA)
        pay = payload if payload is not None else F.encode(
            F.concat(F.lit("pay-"), F.col("k").cast("string")), "utf-8")
        df = (
            spark.range(n).select(F.col("id").alias("k"), pay.alias("payload"))
            .repartition(parts)
        )
        out = str(tmp_path / "ocf")
        write_avro_files(df, sch, out, codec=codec, block_records=64)
        return sch, out

    def _collect(self, df):
        return sorted((r.k, bytes(r.payload)) for r in df.collect())

    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_split_read_equals_whole_file_read(self, spark, tmp_path, codec):
        from avro_spark.sources.avro_ocf import read_avro_files

        sch, out = self._write(spark, tmp_path, codec=codec)
        whole = self._collect(read_avro_files(spark, out, sch))
        # tiny split size forces MANY ranges per file
        split = self._collect(read_avro_files(spark, out, sch, split_bytes=4096))
        assert whole == split
        assert len(whole) == 2000

    def test_split_planning_produces_multiple_tasks(self, spark, tmp_path):
        from avro_spark.sources.avro_ocf import read_avro_files_split

        sch, out = self._write(spark, tmp_path, parts=1)
        df = read_avro_files_split(spark, out, sch, split_bytes=4096)
        # planner splits one file into many ranges; every row still read
        assert df.count() == 2000

    def test_split_bytes_auto(self, spark, tmp_path):
        """split_bytes='auto' sizes ranges to one task wave (total bytes
        / parallelism, floored at 16 MB — so these small files become
        one split each) and reads exactly the same rows; junk values
        are rejected loudly."""
        from avro_spark.sources.avro_ocf import (
            read_avro_files,
            read_avro_files_split,
        )

        sch, out = self._write(spark, tmp_path)
        whole = self._collect(read_avro_files(spark, out, sch))
        auto = self._collect(
            read_avro_files(spark, out, sch, split_bytes="auto")
        )
        assert whole == auto
        with pytest.raises(Exception, match="bad split_bytes"):
            read_avro_files_split(spark, out, sch, split_bytes="huge")
        with pytest.raises(Exception, match="bad split_bytes"):
            read_avro_files_split(spark, out, sch, split_bytes=0)

    def test_split_boundary_alignment_sweep(self, spark, tmp_path):
        """Every split size (prime-ish, tiny, huge) must partition the
        blocks exactly — no duplicated or lost rows at any boundary."""
        from avro_spark.sources.avro_ocf import read_avro_files_split

        sch, out = self._write(spark, tmp_path, n=500, parts=1)
        for sb in (257, 1021, 4096, 1 << 20):
            rows = self._collect(read_avro_files_split(spark, out, sch, split_bytes=sb))
            assert [k for k, _p in rows] == list(range(500)), sb

    def test_sync_collision_in_payload(self, spark, tmp_path):
        """A payload CONTAINING the 16-byte sync marker must not derail
        the scan: the candidate fails block validation and scanning
        continues to the true block start."""
        import hashlib as _hl
        import json as _json

        sch = avs.create(self.SCHEMA)
        sync = _hl.md5(_json.dumps(sch.export()).encode("utf-8")).digest()
        from avro_spark.sources.avro_ocf import read_avro_files_split

        _, out = self._write(
            spark, tmp_path, n=1000, parts=1,
            payload=F.concat(F.lit(bytearray(sync)), F.lit(bytearray(sync))),
        )
        rows = self._collect(read_avro_files_split(spark, out, sch, split_bytes=512))
        assert [k for k, _p in rows] == list(range(1000))
        assert all(p == sync * 2 for _k, p in rows)

    def test_header_only_file(self, spark, tmp_path):
        """A file with zero blocks plans zero splits and reads empty."""
        from avro_spark.sources.avro_ocf import (
            read_avro_files_split, write_ocf_bytes,
        )

        sch = avs.create(self.SCHEMA)
        p = tmp_path / "ocf2"
        p.mkdir()
        (p / "part-0.avro").write_bytes(write_ocf_bytes(sch, []))
        df = read_avro_files_split(spark, str(p), sch, split_bytes=4096)
        assert df.count() == 0


class TestRandomSyncMarker:
    """Round-3 advisor (medium): the writers defaulted to a DETERMINISTIC
    sync (md5 of schema), so a bytes payload embedding a same-schema OCF
    file could carry a valid sync+block inside a payload — ambiguous for
    sync-scan split reads. The default is now a random per-file sync
    (the Avro spec's guarantee); deterministic_sync(schema) is the
    reproducible-bytes opt-in."""

    SCH = {"type": "record", "name": "B",
           "fields": [{"name": "id", "type": "long"},
                      {"name": "b", "type": "bytes"}]}

    def test_random_sync_default_reads_back(self):
        import avro_spark as avs
        from avro_spark.sources.avro_ocf import (
            read_ocf_bytes,
            write_ocf_bytes,
        )

        sch = avs.create(self.SCH)
        recs = [{"id": 1, "b": b"\x00" * 8}, {"id": 2, "b": b"hi"}]
        f1 = write_ocf_bytes(sch, recs)
        f2 = write_ocf_bytes(sch, recs)
        assert f1[-16:] != f2[-16:], "sync must be random per file"
        for f in (f1, f2):
            _, rows = read_ocf_bytes(f)
            assert rows == recs

    def test_deterministic_sync_opt_in(self):
        import avro_spark as avs
        from avro_spark.sources.avro_ocf import (
            deterministic_sync,
            write_ocf_bytes,
        )

        sch = avs.create(self.SCH)
        recs = [{"id": 1, "b": b"x"}]
        s = deterministic_sync(sch)
        assert write_ocf_bytes(sch, recs, sync=s) == \
            write_ocf_bytes(sch, recs, sync=s)

    def test_split_read_with_embedded_same_schema_ocf_payload(
            self, spark, tmp_path):
        """The adversarial shape: a payload byte-containing a COMPLETE
        same-schema OCF file (deterministic sync + valid block). With a
        random outer sync the embedded marker cannot collide, so tiny
        splits recover exactly the source rows."""
        import os

        import avro_spark as avs
        from avro_spark.sources.avro_ocf import (
            deterministic_sync,
            read_avro_files_split,
            write_ocf_bytes,
        )

        sch = avs.create(self.SCH)
        inner = write_ocf_bytes(
            sch, [{"id": 99, "b": b"p" * 64}], sync=deterministic_sync(sch))
        recs = [{"id": i, "b": inner} for i in range(50)]
        path = tmp_path / "embedded"
        os.makedirs(path, exist_ok=True)
        blob = write_ocf_bytes(sch, recs, block_records=5)
        assert deterministic_sync(sch) in blob  # payload DOES carry it
        (path / "part-00000.avro").write_bytes(blob)
        got = sorted(
            (r["id"], bytes(r["b"]))
            for r in read_avro_files_split(
                spark, str(path), sch, split_bytes=2048).collect()
        )
        assert got == [(i, inner) for i in range(50)]


class TestOcfSplitFuzz:
    """Property fuzz for the splittable OCF read: over random schemas
    (records incl. nested arrays/maps/unions/nullables), random block
    sizes, both codecs, and random tiny split sizes, the split read must
    return EXACTLY the rows of the whole-file read — no lost, duplicated,
    or reordered-within-row data at any split boundary."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(data=st.data())
    @settings(max_examples=12, deadline=None)
    def test_split_read_equals_whole_read(self, data, spark, tmp_path_factory):
        import os

        import avro_spark as avs
        from hypothesis import strategies as st
        from test_fuzz_roundtrip import _Gen, _root_record

        from avro_spark.sources.avro_ocf import (
            read_avro_files,
            read_avro_files_split,
            write_ocf_bytes,
        )

        gen = _Gen(data.draw)
        schema_dict = _root_record(gen)
        sch = avs.create(schema_dict)
        n = data.draw(st.integers(5, 40))
        records = [
            avs.validate(sch, gen.value(schema_dict)) for _ in range(n)
        ]
        codec = data.draw(st.sampled_from(["null", "deflate"]))
        block_records = data.draw(st.integers(1, 7))
        blob = write_ocf_bytes(
            sch, records, codec=codec, block_records=block_records)
        d = tmp_path_factory.mktemp("ocf_fuzz")
        (d / "part-00000.avro").write_bytes(blob)
        split_bytes = data.draw(st.integers(64, 2048))
        whole = sorted(map(str, read_avro_files(
            spark, str(d), sch).collect()))
        split = sorted(map(str, read_avro_files_split(
            spark, str(d), sch, split_bytes=split_bytes).collect()))
        assert len(whole) == n
        assert whole == split, (codec, block_records, split_bytes)


class TestBlockCodecs:
    """Avro-spec block codecs beyond null/deflate: bzip2 and xz are
    stdlib-backed; snappy is the from-scratch public-format codec
    (snappy_codec.py, r7); zstandard rides pyarrow's bundled libzstd
    (r7 — all six spec codecs now work); unknown names are rejected."""

    SCHEMA = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"}, {"name": "b", "type": "string"}]}

    def _roundtrip(self, codec):
        import avro_spark as avs
        from avro_spark.sources.avro_ocf import read_ocf_bytes, write_ocf_bytes

        sch = avs.create(self.SCHEMA)
        recs = [{"a": i, "b": "x" * (i % 37)} for i in range(200)]
        blob = write_ocf_bytes(sch, recs, codec=codec, block_records=64)
        _, back = read_ocf_bytes(blob)
        assert back == recs

    def test_bzip2_roundtrip(self):
        self._roundtrip("bzip2")

    def test_xz_roundtrip(self):
        self._roundtrip("xz")

    def test_df_level_bzip2(self, spark, tmp_path):
        import avro_spark as avs
        from avro_spark.sources.avro_ocf import read_avro_files, write_avro_files

        sch = avs.create(self.SCHEMA)
        df = spark.createDataFrame(
            [(i, "y" * (i % 11)) for i in range(500)], "a long, b string"
        )
        write_avro_files(df, sch, str(tmp_path / "bz"), codec="bzip2")
        back = read_avro_files(spark, str(tmp_path / "bz"), sch)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
        # split read decompresses per block too
        back2 = read_avro_files(
            spark, str(tmp_path / "bz"), sch, split_bytes=2048
        )
        assert sorted(map(tuple, back2.collect())) == sorted(map(tuple, df.collect()))

    def test_snappy_and_zstandard_are_builtin(self):
        # r7: snappy is the from-scratch built-in (snappy_codec.py) and
        # zstandard rides pyarrow's libzstd — both must WORK, not error
        import avro_spark as avs
        from avro_spark.sources.avro_ocf import read_ocf_bytes, write_ocf_bytes

        sch = avs.create(self.SCHEMA)
        rows = [{"a": i, "b": "x" * (i % 40)} for i in range(200)]
        for codec in ("snappy", "zstandard"):
            blob = write_ocf_bytes(sch, rows, codec=codec)
            assert read_ocf_bytes(blob)[1] == rows, codec

    def test_zstandard_roundtrip(self):
        self._roundtrip("zstandard")

    def test_zstandard_blocks_actually_compress(self):
        from avro_spark.sources.avro_ocf import _codec_pair

        comp, dec = _codec_pair("zstandard")
        data = (b"the same training document body " * 400)
        blob = comp(data)
        assert len(blob) < len(data) // 4
        assert dec(blob) == data

    def test_zstandard_corrupt_block_is_loud(self):
        import pytest as _pytest
        from avro_spark.errors import AvroSparkError
        from avro_spark.sources.avro_ocf import _codec_pair

        comp, dec = _codec_pair("zstandard")
        blob = bytearray(comp(b"payload " * 100))
        blob[10:14] = bytes(4)
        with _pytest.raises(AvroSparkError, match="zstandard"):
            dec(bytes(blob))
        with _pytest.raises(AvroSparkError, match="zstandard"):
            dec(b"\x00\x01\x02")  # not a zstd frame at all

    def test_unknown_codec_rejected(self):
        import avro_spark as avs
        import pytest as _pytest
        from avro_spark.errors import AvroSparkError
        from avro_spark.sources.avro_ocf import write_ocf_bytes

        sch = avs.create(self.SCHEMA)
        with _pytest.raises(AvroSparkError, match="unsupported Avro codec"):
            write_ocf_bytes(sch, [{"a": 1, "b": ""}], codec="lz4")
