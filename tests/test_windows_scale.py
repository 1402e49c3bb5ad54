"""Bucket-count scaling for the two-phase window helpers (r8 verdict
What's-wrong #2 / Next-round #1): buckets must grow with input size so
per-bucket window partitions — one in-task sort each — stay bounded at
100 TB instead of growing O(N) under the old constant 1024 cap.

Three angles:
  1. pure sizing rule (`_buckets_for_bytes`) property-tested over the
     whole size range with hypothesis;
  2. the real pipeline at sf0.01 vs sf0.1 (10x growth): bucket count
     scales up, max per-bucket rows stays flat;
  3. values are bucket-count-invariant (the standing guarantee that
     makes the sizing rule safe to change at all).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pmc_conversion_spark.operators import windows as W


class TestSizingRule:
    @given(size=st.integers(min_value=0, max_value=1 << 50),
           par=st.integers(min_value=1, max_value=4096))
    @settings(max_examples=200, deadline=None)
    def test_per_bucket_bytes_bounded_until_cap(self, size, par):
        b = W._buckets_for_bytes(size, par)
        floor_b = max(64, par * 4)
        assert floor_b <= b <= W._MAX_BUCKETS or b == min(
            W._MAX_BUCKETS, floor_b)
        if b < W._MAX_BUCKETS and size > 0 and b > floor_b:
            # sizing (not the floor or cap) chose b: per-bucket bytes
            # must meet the target
            assert -(-size // b) <= W._TARGET_BYTES_PER_BUCKET

    @given(par=st.integers(min_value=1, max_value=4096),
           size=st.integers(min_value=1, max_value=1 << 49))
    @settings(max_examples=100, deadline=None)
    def test_monotone_in_size(self, par, size):
        assert (W._buckets_for_bytes(2 * size, par)
                >= W._buckets_for_bytes(size, par))

    def test_local_sf_sizes_hit_the_floor(self):
        # the test SFs are well under target*floor bytes, so local
        # behavior (and therefore every recorded local timing) is
        # unchanged by the r9 sizing rule
        for size in (117_248, 1_042_463, 10_818_932):  # sf0.001/0.01/0.1
            assert W._buckets_for_bytes(size, 8) == 64
            assert W._buckets_for_bytes(size, 32) == 128

    def test_100tb_is_capped_not_runaway(self):
        b = W._buckets_for_bytes(100 * 10**12, 4000)
        assert b == W._MAX_BUCKETS
        # at the cap, per-bucket bytes for a 100 TB *single frame* are
        # ~763 MiB — bounded, vs ~100 GB under the old 1024 cap
        assert (100 * 10**12) // b < 4 * W._TARGET_BYTES_PER_BUCKET


@pytest.fixture(scope="module")
def small_target(request):
    # shrink the per-bucket target so the 1 MB / 10.8 MB local files
    # exercise the sizing branch the way 10 TB / 100 TB would
    old = W._TARGET_BYTES_PER_BUCKET
    W._TARGET_BYTES_PER_BUCKET = 1 << 14
    yield
    W._TARGET_BYTES_PER_BUCKET = old


def _bucket_profile(spark, sf_dir):
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_linenumber", "l_extendedprice"))
    key = F.struct(F.col("l_orderkey"), F.col("l_linenumber"),
                   F.col("l_extendedprice"))
    buckets = W._resolve_buckets(li, None)
    prof = (W._range_bucketed(li, buckets, key)
            .groupBy("__bucket").count()
            .agg(F.max("count").alias("mx"), F.count("*").alias("nb"),
                 F.sum("count").alias("n")).collect()[0])
    return buckets, prof.mx, prof.n


@pytest.mark.slow
def test_per_bucket_rows_flat_under_10x_growth(spark, small_target):
    b01, mx01, n01 = _bucket_profile(spark, "/root/testdata/sf0.01")
    b10, mx10, n10 = _bucket_profile(spark, "/root/testdata/sf0.1")
    assert n10 >= 9 * n01  # the 10x growth premise
    # bucket count scaled with the input ...
    assert b10 >= 5 * b01
    # ... so the largest single window partition did NOT scale with it
    assert mx10 <= 2.5 * mx01
    # and per-bucket bytes stay near target (boundary-sample slack ≤ 8x)
    for sf_dir, mx, n in (("/root/testdata/sf0.01", mx01, n01),
                          ("/root/testdata/sf0.1", mx10, n10)):
        leaf = W._leaf_input_bytes(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
        assert leaf * mx / n <= 8 * W._TARGET_BYTES_PER_BUCKET


def test_values_invariant_to_bucket_count(spark):
    df = spark.range(3000).select(
        ((F.col("id") * 2654435761) % 1000003).alias("k"),
        (F.col("id") % 13).alias("v"))
    a = W.running_sum_distributed(df, "k", "v", out_col="r", buckets=7)
    b = W.running_sum_distributed(df, "k", "v", out_col="r", buckets=97)
    assert a.join(b.withColumnRenamed("r", "r2"), ["k", "v"]) \
            .where(F.col("r") != F.col("r2")).count() == 0
    sa = W.surrogate_key_distributed(df.select("k"), "k", buckets=5)
    sb = W.surrogate_key_distributed(df.select("k"), "k", buckets=131)
    assert sa.join(sb.withColumnRenamed("sk", "sk2"), "k") \
             .where(F.col("sk") != F.col("sk2")).count() == 0


def test_binary_search_matches_linear_scan(spark):
    # _count_le (O(log B)) must agree with the r7 full-array scan on
    # random keys including nulls and duplicate boundary values
    df = spark.range(4000).select(
        F.when(F.col("id") % 89 == 0, None)
        .otherwise((F.col("id") * 48271) % 997).alias("k"))
    bnds = W._bucket_boundaries(df, 96, F.col("k"))
    j = df.crossJoin(F.broadcast(bnds))
    bad = j.select(
        W._count_le(F.col("__bnds"), F.col("k")).alias("bs"),
        F.size(F.filter(F.col("__bnds"),
                        lambda b: b <= F.col("k"))).alias("lin")) \
        .where(F.col("bs") != F.col("lin")).count()
    assert bad == 0


def test_scalar_bucket_path_value_identical_and_monotone(spark):
    # the r9 O(1)/row scalar fast path (_scalar_bucketed) must (a)
    # produce the SAME prefix sums as the struct boundary-search path,
    # (b) assign buckets monotone in the key, (c) put equal keys in
    # one bucket, and (d) send null keys to bucket 0
    # k is injective over the ids (multiplication mod a prime > n is
    # a bijection) — the helper's contract requires a unique order key
    uniq = spark.range(5000).select(
        ((F.col("id") * 48271) % 1000003).alias("k"),
        (F.col("id") % 11).alias("v"))
    slow = W.running_sum_distributed(uniq, "k", "v", out_col="r",
                                     buckets=64)
    fast = W.running_sum_distributed(uniq, "k", "v", out_col="r2",
                                     buckets=64, bucket_key=F.col("k"))
    assert slow.join(fast, ["k", "v"]) \
               .where(F.col("r") != F.col("r2")).count() == 0

    df = spark.range(5000).select(
        F.when(F.col("id") % 97 == 0, None)
        .otherwise((F.col("id") * 48271) % 701).alias("k"))
    rb = W._scalar_bucketed(df, 64, F.col("k"))
    # monotone: max key of bucket i < min key of bucket i+1 (equal
    # keys can't straddle, so max(i) < min(i+1) over distinct keys)
    prof = (rb.where(F.col("k").isNotNull()).groupBy("__bucket")
            .agg(F.min("k").alias("mn"), F.max("k").alias("mx"))
            .orderBy("__bucket").collect())
    for a, b in zip(prof, prof[1:]):
        assert a.mx <= b.mn   # <= : boundary-equal keys share a bucket
    straddle = (rb.where(F.col("k").isNotNull()).groupBy("k")
                .agg(F.countDistinct("__bucket").alias("nb"))
                .where(F.col("nb") > 1).count())
    assert straddle == 0
    assert rb.where(F.col("k").isNull()) \
             .where(F.col("__bucket") != 0).count() == 0


def test_scalar_bucket_path_degenerate_inputs(spark):
    # constant key and empty input both collapse to single-bucket
    # assignment (correct, just unparallel) instead of erroring
    const = spark.range(100).select(F.lit(7).alias("k"),
                                    F.lit(1).alias("v"))
    out = W.running_sum_distributed(const, "k", "v", out_col="r",
                                    buckets=32, bucket_key=F.col("k"))
    assert out.agg(F.max("r")).collect()[0][0] == 100
    empty = spark.range(0).select(F.col("id").alias("k"),
                                  F.col("id").alias("v"))
    assert W.running_sum_distributed(
        empty, "k", "v", out_col="r", buckets=32,
        bucket_key=F.col("k")).count() == 0


def test_scalar_bucket_balance_tracks_quantiles(spark):
    # a heavily SKEWED numeric distribution (x^3 over ids) must still
    # spread across buckets because the remap follows sampled
    # quantiles, not the raw value range: with 16 buckets no bucket
    # may hold more than ~4x its fair share
    df = spark.range(20000).select(
        (F.col("id") * F.col("id") * F.col("id")).alias("k"))
    rb = W._scalar_bucketed(df, 16, F.col("k"))
    mx = (rb.groupBy("__bucket").count()
          .agg(F.max("count")).collect()[0][0])
    assert mx <= 4 * (20000 // 16)
