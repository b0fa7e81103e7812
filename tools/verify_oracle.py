"""Local replica of the driver's correctness gate: run each
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at sf0.01, then compare row count, sorted column names, and an
order-insensitive canonical value multiset.

Usage: python tools/verify_oracle.py [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in idx) for r in rows)


# Spark simpleString -> acceptable DuckDB type names. The driver's value
# hash is TYPE-sensitive (r5 range_join: int64 vs int128 values hashed
# apart while rows/schema matched), so every window gate's Spark column
# type must map to the DuckDB type its oracle emits.
_TYPE_PARITY = {
    "tinyint": {"TINYINT"},
    "smallint": {"SMALLINT"},
    "int": {"INTEGER"},
    "bigint": {"BIGINT"},
    "float": {"FLOAT"},
    "double": {"DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "binary": {"BLOB"},
}


def type_mismatches(df, ocols, otypes):
    stypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    bad = []
    for c, ot in zip(ocols, otypes):
        st = stypes.get(c)
        if st is None:
            continue  # column-set mismatch is reported separately
        want = _TYPE_PARITY.get(st)
        if want is not None and ot not in want:
            bad.append(f"{c}: spark={st} oracle={ot}")
    return bad


def spark_rows(df):
    cols = df.columns
    out = []
    for r in df.collect():
        vals = []
        for c in cols:
            v = r[c]
            if hasattr(v, "asDict"):
                v = v.asDict(recursive=True)
            elif isinstance(v, list) and v and hasattr(v[0], "asDict"):
                v = [x.asDict(recursive=True) for x in v]
            vals.append(v)
        out.append(vals)
    return cols, out


def main(only: list[str]):
    import __spark_entry__ as E
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("verify")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, oracles = dict(E.queries()), dict(E.oracle_sql())
    # folded gates: not in the driver's 50-entry window, still verified here
    qs.update(getattr(E, "extra_queries", dict)())
    oracles.update(getattr(E, "extra_oracle_sql", dict)())
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            scols, srows = spark_rows(df)
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            fails.append(name)
            continue
        # the driver canonicalizes via pandas sort_values, which cannot
        # sort list/dict/bytes cells — flag them here so the failure is
        # caught locally, not in CORRECTNESS_r{N}
        bad_cols = sorted(
            {
                scols[i]
                for r in srows[:100]
                for i, v in enumerate(r)
                if isinstance(v, (list, dict, bytes, bytearray))
            }
        )
        if bad_cols and name in qs and name in dict(E.queries()):
            print(f"FAIL {name}: driver-unsortable columns {bad_cols}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            fails.append(name)
            continue
        problems = []
        # the driver's value hash is TYPE-sensitive where this tool's str()
        # canon is not: a DuckDB HUGEINT (int128 from sum(int)) or DECIMAL
        # output hashes differently from Spark's bigint/double even when the
        # values match (r5 range_join went hash-red exactly this way). Lint
        # the oracle's *final* result types so the divergence fails here.
        try:
            rel = con.sql(oracles[name])
            otypes = [str(t).upper() for t in rel.types]
            lint_cols = list(rel.columns)
            bad_types = [
                f"{c}:{t}"
                for c, t in zip(lint_cols, otypes)
                if "HUGEINT" in t or t.startswith("DECIMAL")
            ]
            if bad_types:
                problems.append(
                    f"oracle result types driver-hash-unsafe {bad_types} "
                    "(CAST the final SELECT to BIGINT/DOUBLE)"
                )
            mismatched = type_mismatches(df, lint_cols, otypes)
            if mismatched:
                problems.append(
                    f"spark/oracle type mismatch {mismatched} "
                    "(driver hash is type-sensitive — CAST one side)"
                )
        except Exception:
            pass  # type introspection is best-effort; value compare still runs
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            a, b = rowset(scols, srows), rowset(ocols, orows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            fails.append(name)
        else:
            print(f"PASS {name} ({len(srows)} rows)")
    print("---")
    print("FAILURES:", fails if fails else "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
