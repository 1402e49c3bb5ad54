"""Dump `.explain("formatted")` for named registry queries to files.

Usage:
    python tools/plan_dump.py <outdir> <suffix> [name ...]

Writes <outdir>/<name>_<suffix>.txt for every requested query (default:
the bench HEADLINE list). Queries whose construction runs driver-side
loops (localCheckpoint per round) execute those rounds during plan
construction; the dumped plan is the final returned frame's plan with
checkpoint scan leaves — exactly what executes for the output stage.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from pmc_conversion_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("plan-dump")
    qs = E.queries()
    if not names:
        import bench
        names = [n for n in bench.HEADLINE if n in qs]
    for n in names:
        if n not in qs:
            print(f"skip {n}: not registered")
            continue
        try:
            df = qs[n](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building/explaining {n}: {exc!r}"
        path = os.path.join(outdir, f"{n}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
