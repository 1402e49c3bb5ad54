"""Deterministic sampling/splits, distributed running sum, SCD2, and
PII redaction — invariants the sf0.01 oracle queries don't isolate:
partitioning-independence, weight validation, and null-safe change
detection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pmc_conversion_spark.functions.sampling import (sample_hash,
                                                     split_assign,
                                                     stratified_sample_hash)
from pmc_conversion_spark.functions.text import redact_pii
from pmc_conversion_spark.operators.windows import (running_sum_distributed,
                                                    scd2_history)


def test_split_assignment_is_partitioning_invariant(spark):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    w = [("train", .8), ("val", .1), ("test", .1)]
    a = {r.doc_id: r.split
         for r in split_assign(df, "doc_id", w, salt="s").collect()}
    b = {r.doc_id: r.split
         for r in split_assign(df.repartition(13), "doc_id", w,
                               salt="s").collect()}
    assert a == b
    # different salt redraws the split
    c = {r.doc_id: r.split
         for r in split_assign(df, "doc_id", w, salt="other").collect()}
    assert a != c
    # all three splits non-empty at n=500
    assert set(a.values()) == {"train", "val", "test"}


def test_split_weights_must_sum_to_one(spark):
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        split_assign(df, "doc_id", [("a", .5), ("b", .3)], salt="s")


def test_sample_hash_is_subset_and_stable(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    s1 = {r.doc_id for r in sample_hash(df, "doc_id", 0.2,
                                        salt="s").collect()}
    s2 = {r.doc_id for r in sample_hash(df.repartition(7), "doc_id", 0.2,
                                        salt="s").collect()}
    assert s1 == s2
    assert 100 < len(s1) < 300  # ~200 expected
    # a larger fraction strictly extends the sample (nested samples)
    s3 = {r.doc_id for r in sample_hash(df, "doc_id", 0.5,
                                        salt="s").collect()}
    assert s1 < s3


def test_stratified_default_keeps_unlisted_strata(spark, fixture_df):
    df = fixture_df([(i, "en" if i % 2 else "fr") for i in range(200)],
                    "doc_id long, lang string")
    out = stratified_sample_hash(df, "lang", "doc_id", {"en": 0.0},
                                 salt="s", default=1.0)
    langs = {r.lang for r in out.collect()}
    assert langs == {"fr"}
    assert out.count() == 100


def test_running_sum_distributed_matches_global_window(spark, fixture_df):
    rows = [(i, (i * 37) % 11 + 1) for i in range(500)]
    df = fixture_df(rows, "k long, v long")
    got = running_sum_distributed(df, "k", "v", out_col="rs", buckets=16)
    ref = df.withColumn(
        "rs", F.sum("v").over(
            Window.orderBy("k").rowsBetween(Window.unboundedPreceding,
                                            Window.currentRow)))
    assert (got.select("k", "rs").exceptAll(ref.select("k", "rs")).count()
            == 0)
    assert got.count() == ref.count()


def test_scd2_history_bounds_and_null_safety(spark, fixture_df):
    snaps = fixture_df(
        [(1, 1, "a"), (1, 2, "a"), (1, 3, "b"),     # change at v3
         (2, 1, None), (2, 2, None), (2, 3, None)],  # nulls: no change
        "k long, version int, attr string")
    hist = {(r.k, r.valid_from): (r.attr, r.valid_to)
            for r in scd2_history(snaps, "k", "version",
                                  ["attr"]).collect()}
    assert hist == {(1, 1): ("a", 3), (1, 3): ("b", None),
                    (2, 1): (None, None)}


def test_redact_pii_patterns(spark, fixture_df):
    df = fixture_df(
        [(1, "mail me: a.b+c@x-y.co or call 555-123-4567 now"),
         (2, "no pii here 12345"),
         (3, "dots 555.123.4567 and x@y.io")],
        "id long, text string")
    out = {r.id: r.red
           for r in df.select("id",
                              redact_pii(F.col("text")).alias("red"))
           .collect()}
    assert out[1] == "mail me: <EMAIL> or call <PHONE> now"
    assert out[2] == "no pii here 12345"
    assert out[3] == "dots <PHONE> and <EMAIL>"


def _py_bucket(salt: str, doc_id: int) -> int:
    """Pure-Python replay of sampling.hash_bucket (portable md5 family)."""
    import hashlib
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % 10000


def test_mixture_weighted_exact_multiset(spark):
    from pmc_conversion_spark.functions.sampling import mixture_weighted
    df = spark.createDataFrame(
        [(i, "a" if i < 40 else ("b" if i < 80 else "c"))
         for i in range(120)], "doc_id long, dom string")
    out = mixture_weighted(df, "dom", "doc_id",
                           {"a": 2.0, "b": 0.5, "c": 0.0},
                           salt="mx", default=1.0).collect()
    got = {}
    for r in out:
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
        assert 1 <= r.copy <= got[r.doc_id] + 1
    for i in range(120):
        dom = "a" if i < 40 else ("b" if i < 80 else "c")
        w10k = {"a": 20000, "b": 5000, "c": 0}[dom]
        want = w10k // 10000 + (1 if _py_bucket("mx", i) < w10k % 10000 else 0)
        assert got.get(i, 0) == want, (i, dom)
    # integer weight 2.0: every 'a' row exactly twice, copies 1 and 2
    a_copies = sorted(r.copy for r in out if r.doc_id == 0)
    assert a_copies == [1, 2]


def test_mixture_weighted_partitioning_invariant(spark):
    from pmc_conversion_spark.functions.sampling import mixture_weighted
    df = spark.range(300).select(F.col("id").alias("doc_id"),
                                 (F.col("id") % 3).cast("string").alias("d"))
    w = {"0": 1.5, "1": 0.25}
    a = sorted((r.doc_id, r.copy) for r in
               mixture_weighted(df, "d", "doc_id", w, salt="s").collect())
    b = sorted((r.doc_id, r.copy) for r in
               mixture_weighted(df.repartition(11), "d", "doc_id", w,
                                salt="s").collect())
    assert a == b and len(a) > 0


def test_decontaminate_flags_planted_overlap(spark):
    from pmc_conversion_spark.functions.dedup import decontaminate
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "noise one two alpha beta gamma delta epsilon tail"),
         (2, "completely unrelated words with no shared five gram"),
         (3, "alpha beta gamma delta epsilon zeta verbatim copy here")],
        "doc_id long, text string")
    hits = {r.doc_id: r.n_hit
            for r in decontaminate(train, ev, n=5).collect()}
    assert 1 in hits and 3 in hits and 2 not in hits
    # doc 3 contains both 5-grams of the eval doc, doc 1 only the first
    assert hits[3] == 2 and hits[1] == 1


def test_decontaminate_short_docs_whole_text_rule(spark):
    from pmc_conversion_spark.functions.dedup import decontaminate
    # docs shorter than n shingle to the whole text: an exact short
    # match is caught, a partial one is not
    ev = spark.createDataFrame([(9, "tiny doc")], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc plus more trailing words")],
        "doc_id long, text string")
    hits = {r.doc_id for r in decontaminate(train, ev, n=5).collect()}
    assert hits == {1}


def test_countmin_estimates_dominate_truth(spark):
    """CMS guarantee: every estimate >= the true count (the oracle
    additionally pins the exact deterministic estimates)."""
    import __spark_entry__ as E
    out = E.queries()["sketch_countmin_freq"](
        spark, "/root/testdata/sf0.001").collect()
    assert out and all(r.est_n >= r.true_n for r in out)


def test_bpe_greedy_merge_counts_nonoverlapping(spark):
    """'aaaa' admits 2 greedy (a,a) merges, 'aaa' only 1 — the
    non-overlap fold must match textbook BPE replace semantics."""
    import pandas as pd
    import pmc_conversion_spark.queries.llmdata as L
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1], "text": ["aaaa aaa aa xy"]}))
    orig = L._docs
    L._docs = lambda s, sf: df
    try:
        from pmc_conversion_spark.queries import REGISTRY
        r = REGISTRY["vocab_bpe_merge_step"].fn(
            spark, "ignored").collect()[0]
    finally:
        L._docs = orig
    assert (r.pair_a, r.pair_b) == ("a", "a")
    assert r.pair_count == 3 + 2 + 1        # overlapping stats
    assert r.n_merges == 2 + 1 + 1          # greedy non-overlapping
    assert r.symbols_after_merge == (4 + 3 + 2 + 2) - 4
