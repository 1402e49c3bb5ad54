"""Runtime stage-level checkpoint audit (VERDICT r9, next-round #4).

The r9 #31 sweep kept 18 multi-consumer `localCheckpoint` sites on the
strength of formatted-plan scan counts plus per-query wall-time A/Bs —
but three same-shape fixes measured SLOWER and were reverted, proving
static plan counts overstate replay when AQE reuses identical shuffle
query stages at runtime. This tool settles the question per query with
RUNTIME evidence: it executes each named query in both variants inside
one session, alternating A/B per repeat so host drift hits both sides
equally, and records what actually ran:

  - variant "ckpt"   — the committed form (checkpoints live);
  - variant "nockpt" — `DataFrame.localCheckpoint` monkeypatched to a
    pass-through while the query is BUILT AND EXECUTED (safe for the
    audited set: none of the 18 queries is a fixpoint loop, so nothing
    blocks on a checkpoint-materialization observation).

Per (query, variant): min/median wall seconds (construction + action,
same timed region as bench.py), and — from the job group's status-
tracker data — executed job / stage / task counts. A checkpoint is
LOAD-BEARING when nockpt runs more stages/tasks AND more wall time;
it is AQE-REDUNDANT when nockpt executes the same work in the same
time (the duplicated subtrees were deduped at runtime anyway).

    python tools/stage_audit.py [--repeats N] [name ...]

Default names: the 18 #31 sites. Prints a markdown table (pasteable
into OPTIMIZATION_r10.md).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: the r9 #31 kept-checkpoint queries (OPTIMIZATION_r09.md table)
DEFAULT_NAMES = [
    "agg_harrell_cindex", "sketch_theta_intersect", "text_burrows_delta",
    "agg_ndcg_eval", "text_bm25_topk", "text_tfidf_topk",
    "text_cooccurrence_pmi", "vocab_bigram_lm_nll", "text_heaps_law_fit",
    "text_gries_dp", "vocab_bpe_merge_step", "vocab_coverage_curve",
    "agg_kendall_tau_b", "agg_distance_correlation", "agg_hoeffding_d",
    "agg_jonckheere_terpstra", "ts_matrix_profile", "ts_seasonal_decompose",
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

    spark = get_spark("stage-audit")
    qs = E.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm JIT / Python workers / parquet footers, bench-style
    spark.range(1).count()
    n_workers = sc.defaultParallelism
    (spark.range(n_workers).repartition(n_workers)
     .mapInPandas(lambda it: it, "id long").count())

    real_ckpt = DataFrame.localCheckpoint

    def run_once(name: str, variant: str, rep: int) -> dict:
        group = f"audit:{name}:{variant}:{rep}"
        sc.setJobGroup(group, group)
        if variant == "nockpt":
            DataFrame.localCheckpoint = lambda self, eager=True: self
        try:
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            wall = time.time() - t0
        finally:
            DataFrame.localCheckpoint = real_ckpt
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
          "| tasks | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for name in names:
        if name not in qs:
            print(f"| {name} | — | not registered | | | | | |")
            continue
        # one untimed warm pass per variant (JIT for this query's shapes)
        run_once(name, "ckpt", -1)
        run_once(name, "nockpt", -1)
        rows = {"ckpt": [], "nockpt": []}
        for rep in range(repeats):          # alternate to share drift
            rows["ckpt"].append(run_once(name, "ckpt", rep))
            rows["nockpt"].append(run_once(name, "nockpt", rep))
        out = {}
        for v, rs in rows.items():
            walls = [r["wall"] for r in rs]
            out[v] = {
                "min": min(walls), "med": statistics.median(walls),
                "jobs": max(r["jobs"] for r in rs),
                "stages": max(r["stages"] for r in rs),
                "tasks": max(r["tasks"] for r in rs)}
        a, b = out["ckpt"], out["nockpt"]
        if b["stages"] > a["stages"] and b["min"] > a["min"] * 1.10:
            verdict = "LOAD-BEARING"
        elif b["min"] < a["min"] * 0.90:
            verdict = "REDUNDANT (nockpt faster)"
        else:
            verdict = "NEUTRAL"
        for v in ("ckpt", "nockpt"):
            o = out[v]
            print(f"| {name} | {v} | {o['min']:.3f} | {o['med']:.3f} "
                  f"| {o['jobs']} | {o['stages']} | {o['tasks']} "
                  f"| {verdict if v == 'nockpt' else ''} |")


if __name__ == "__main__":
    main()
