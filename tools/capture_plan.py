"""Capture `.explain("formatted")` for gates into plans/$PLANS_ROUND/ (default r11).

Usage: python tools/capture_plan.py <suffix> <gate> [gate ...]

Writes plans/r10/<gate>_<suffix>.txt (suffix = "before" / "after").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from bench import _build_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    gates = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _build_session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    qs = {**E.queries(), **E.extra_queries()}
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", os.environ.get("PLANS_ROUND", "r11"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in gates:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
