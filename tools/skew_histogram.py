"""Skew audit of the dedup band/posting join keys (VERDICT r9 #3).

The minhash LSH band join and the n-gram posting join are the
heaviest untouched LLM-pipeline family; both generate candidate pairs
INSIDE per-key buckets, so a hot key means one task owns C(n,2) of
the pair work. This tool measures the actual key histograms:

  - posting keys: docs per shingle hash (ngram_jaccard / containment /
    method_agreement core), before and after the MAX_POSTING cap;
  - band keys: docs per (band, band-hash) bucket (minhash_lsh core).

For each it prints count, mean, p50/p90/p99/max bucket size, the
max/median ratio (guide §2.5: >5-10x is worth fixing), the top-10
hottest keys, and the pair-work concentration (share of Σ C(n,2)
owned by the single hottest key) — the number that decides whether a
salt is needed.

    python tools/skew_histogram.py [sf_dir ...]

Defaults to /root/testdata/sf0.1. Extra dirs (e.g. a synthetic 10x
scale-up) can be passed to test whether skew GROWS with corpus size.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def describe(spark, keyed, label: str) -> None:
    """keyed: DataFrame(key..., n) — one row per bucket."""
    from pyspark.sql import functions as F
    row = keyed.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.sum("n").alias("rows"),
        F.mean("n").alias("mean"),
        F.expr("percentile(n, 0.5)").alias("p50"),
        F.expr("percentile(n, 0.9)").alias("p90"),
        F.expr("percentile(n, 0.99)").alias("p99"),
        F.max("n").alias("max"),
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("pairs"),
        F.max(F.col("n") * (F.col("n") - 1) / 2).alias("max_pairs"),
    ).first()
    ratio = row["max"] / max(row["p50"], 1)
    conc = (row["max_pairs"] or 0) / max(row["pairs"] or 0, 1)
    print(f"\n== {label} ==")
    print(f"buckets={row['buckets']:,} rows={row['rows']:,} "
          f"mean={row['mean']:.2f} p50={row['p50']:.0f} "
          f"p90={row['p90']:.0f} p99={row['p99']:.0f} max={row['max']:,}")
    print(f"max/median={ratio:.1f}x  "
          f"pair-work total={row['pairs']:,.0f}  "
          f"hottest-key share={conc:.3%}")
    print("top-10 hottest keys:")
    for r in keyed.orderBy(F.col("n").desc()).limit(10).collect():
        ks = ", ".join(f"{c}={r[c]}" for c in keyed.columns if c != "n")
        print(f"  n={r['n']:>6,}  {ks}")


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    from pyspark.sql import functions as F
    from pmc_conversion_spark.session import get_spark
    from pmc_conversion_spark import tables
    from pmc_conversion_spark.functions import dedup as D

    spark = get_spark("skew-histogram")
    for sf_dir in dirs:
        docs = tables.load(spark, sf_dir, "documents")
        n_docs = docs.count()
        print(f"\n#### {sf_dir} ({n_docs:,} docs) ####")

        sets = D._hashed_shingle_sets(docs, "doc_id", "text", 3)
        postings = sets.select("doc_id", F.explode("hs").alias("shingle"))
        post_hist = postings.groupBy("shingle").agg(
            F.count(F.lit(1)).alias("n"))
        describe(spark, post_hist, "posting keys (docs per shingle hash)")
        over = post_hist.filter(
            F.col("n") > D.MAX_POSTING_DEFAULT).count()
        kept = post_hist.filter(
            F.col("n").between(2, D.MAX_POSTING_DEFAULT))
        print(f"shingles over MAX_POSTING({D.MAX_POSTING_DEFAULT}) "
              f"cap (dropped): {over:,}")
        describe(spark, kept, "posting keys AFTER cap (the joined set)")

        sig = sets.select(
            "doc_id", D._minhash_sig_expr(32).alias("sig"))
        rows_per_band = 32 // 8
        bands = []
        for b in range(8):
            acc = F.col("sig").getItem(b * rows_per_band)
            for r in range(1, rows_per_band):
                acc = acc * 31 + F.col("sig").getItem(b * rows_per_band + r)
            bands.append(F.struct(F.lit(b).alias("band"),
                                  acc.alias("bh")))
        band_hist = (sig.select(F.explode(F.array(*bands)).alias("x"))
                     .groupBy("x.band", "x.bh")
                     .agg(F.count(F.lit(1)).alias("n"))
                     .filter(F.col("n") >= 2))
        describe(spark, band_hist,
                 "band keys (docs per (band, band-hash), n>=2)")


if __name__ == "__main__":
    main()
