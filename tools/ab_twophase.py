"""Same-session A/B of the r10 two-phase shared bucket shuffle.

The r10 change makes every two-phase helper (surrogate key / running
sums / ntile / next-value) shuffle ONCE on ``__bucket`` and feed both
phases from the reused exchange; the r9 form re-expanded the whole
upstream (scan + boundary sample + bucket assign) under a second,
non-identical exchange for the counts branch.

Variant "shared" is the committed code. Variant "dup" reproduces the
r9 plan by monkeypatching ``DataFrame.repartition`` to a pass-through
when called with the helper's column-name signature (all-string args
containing ``__bucket``) — with the explicit shuffle gone, the window
re-inserts its own exchange and the optimizer prunes the window from
the counts branch, which is exactly the old duplicated shape. No
other call site repartitions by ``__bucket``.

Repeats alternate variants inside one session so host drift hits both
sides equally (bench methodology: construction + .count() timed,
min-of-N). Job/stage/task counts come from the status tracker.

    python -u tools/ab_twophase.py [--repeats N] [name ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_NAMES = [
    "win_surrogate_key_distributed", "pack_sequences",
    "pack_length_bucketing_eval", "win_anchored_vwap",
    "agg_kruskal_wallis", "agg_cvm_test", "sketch_tdigest_batch",
    "agg_gains_table", "agg_uplift_qini", "transmart_observation_fact",
    "dq_auc_score", "agg_ks_test",
]


def main() -> None:
    args = sys.argv[1:]
    repeats = 3
    if args and args[0] == "--repeats":
        repeats = int(args[1])
        args = args[2:]
    names = args or DEFAULT_NAMES

    from pyspark.sql.classic.dataframe import DataFrame
    from pmc_conversion_spark.session import get_spark
    import __spark_entry__ as E

    spark = get_spark("ab-twophase")
    qs = E.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    spark.range(1).count()
    n_workers = sc.defaultParallelism
    (spark.range(n_workers).repartition(n_workers)
     .mapInPandas(lambda it: it, "id long").count())

    real_rep = DataFrame.repartition

    def dup_rep(self, *a, **kw):
        if a and all(isinstance(x, str) for x in a) and "__bucket" in a:
            return self
        return real_rep(self, *a, **kw)

    def run_once(name: str, variant: str, rep: int) -> dict:
        group = f"ab:{name}:{variant}:{rep}"
        sc.setJobGroup(group, group)
        if variant == "dup":
            DataFrame.repartition = dup_rep
        try:
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            wall = time.time() - t0
        finally:
            DataFrame.repartition = real_rep
            sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(group)
        stages, tasks = 0, 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None and si.numCompletedTasks > 0:
                    stages += 1
                    tasks += si.numTasks
        return {"wall": wall, "jobs": len(jobs),
                "stages": stages, "tasks": tasks}

    print("| query | variant | wall min | wall med | jobs | stages "
          "| tasks |")
    print("|---|---|---|---|---|---|---|")
    for name in names:
        if name not in qs:
            print(f"| {name} | not registered | | | | | |")
            continue
        run_once(name, "shared", -1)
        run_once(name, "dup", -1)
        rows = {"shared": [], "dup": []}
        for rep in range(repeats):
            rows["shared"].append(run_once(name, "shared", rep))
            rows["dup"].append(run_once(name, "dup", rep))
        for v in ("shared", "dup"):
            rs = rows[v]
            walls = [r["wall"] for r in rs]
            print(f"| {name} | {v} | {min(walls):.3f} "
                  f"| {statistics.median(walls):.3f} "
                  f"| {max(r['jobs'] for r in rs)} "
                  f"| {max(r['stages'] for r in rs)} "
                  f"| {max(r['tasks'] for r in rs)} |", flush=True)


if __name__ == "__main__":
    main()
