"""Deterministic 10x scale-up of the sf0.1 test tables (VERDICT r9 #8).

The driver benches at sf0.1, where almost every query is dominated by
fixed per-query cost (planning, scheduling, Python worker spin-up) —
the 8-vs-32-core scaling column measures overhead, not operator
parallelism, so a parallelism regression in a heavy operator is
invisible. This tool builds a ~10x corpus so a spot-bench can measure
real core-ratios on the heaviest queries.

Construction (pure replication, NO randomness — rerunning reproduces
byte-identical data):
  - every table is unioned 10 times; replica i shifts every key column
    by i * STRIDE (bigger than any real key), so FK relationships hold
    within each replica and replicas never collide;
  - document text gets a replica-specific token prefix so replicas are
    NOT near-duplicates of each other (otherwise dedup pair work would
    grow quadratically in the replica count instead of linearly, which
    is not what a bigger real corpus looks like);
  - embeddings get a tiny deterministic per-replica offset on one
    coordinate, preserving within-replica near-dup structure;
  - region/nation (bounded dimensions) are copied once, unscaled.

This is a PERFORMANCE lane only: results at this scale have no DuckDB
oracle and are never compared across code versions by value — only
seconds and core-ratios are read. Output dir: $1 (default
/root/sf1_synth). Existing output is overwritten.

    python tools/make_scale_up.py [outdir] [replicas]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
STRIDE = 10_000_000


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1_synth"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from pyspark.sql import functions as F
    from pmc_conversion_spark.session import get_spark

    spark = get_spark("make-scale-up")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    #: key columns to shift per table (FKs shift together, so joins
    #: stay intra-replica)
    keys = {
        "customer": ["c_custkey", "c_nationkey"],
        "supplier": ["s_suppkey", "s_nationkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    # nation/region: bounded dims — nationkey joins must keep working
    # for every replica, and shifting customer/supplier nationkeys
    # would break them; so nationkey is NOT shifted after all.
    for t in ("region", "nation"):
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(f"{t}: copied unscaled")
    for t, ks in keys.items():
        ks = [k for k in ks if not k.endswith("nationkey")]
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(replicas):
            p = df
            for k in ks:
                p = p.withColumn(k, (F.col(k) + F.lit(i * STRIDE))
                                 .cast(df.schema[k].dataType))
            if t == "documents" and i > 0:
                p = p.withColumn(
                    "text", F.concat(F.lit(f"replica{i} "), F.col("text")))
                # keep the derived column self-consistent with the text
                p = p.withColumn(
                    "n_chars",
                    F.length("text").cast(df.schema["n_chars"].dataType))
            if t == "embeddings" and i > 0:
                p = p.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda v, ix: F.when(ix == 0, v + i * 0.001)
                        .otherwise(v)))
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # a handful of output files so scans parallelize like a real
        # multi-file source (and ensure_parallelism leaves them alone)
        u.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet")
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n:,} rows ({replicas} replicas)")


if __name__ == "__main__":
    main()
