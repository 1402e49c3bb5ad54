"""Empty-input robustness: every operator family must survive an
EMPTY (but schema-correct) table — the day-one production hazard
(empty dropzone tick, a filter that matches nothing upstream, a new
tenant with no data). Aggregates must return their empty-group shape,
windows/joins/dedup must return zero rows, and nothing may raise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pmc_conversion_spark import tables
from pmc_conversion_spark.queries import queries

SF_DIR = "/root/testdata/sf0.001"

#: one representative per risk family; ops whose fixtures synthesize
#: their own rows from constants (gen_*, e2e fixtures) are exempt
EMPTY_SAFE = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster_cc",
    "text_token_count",
    "text_tfidf_topk",
    "text_inverted_index",
    "split_train_val_test",
    "pack_sequences",
    "ts_interval_union",
    "win_active_streaks",
    "agg_new_vs_returning",
    "agg_markov_transitions",
    "win_frame_range_time",
    "stream_left_outer_interval",
    "sim_topk_bruteforce",
    "sim_pq_encode",
    "dedup_embedding_cosine_blocked",
    # round-4 families
    "dedup_minhash_bbit",
    "text_feature_hashing",
    "vocab_bigram_lm_nll",
    "pipeline_span_corruption",
    "mm_decode_real",
    "mm_image_grayscale_hist",
    "ts_ewma",
    "agg_bounce_rate",
    "win_running_distinct_count",
    "sketch_bottomk_sample",
    "ts_autocorr_lag",
    "text_stats_mapinarrow",
]


@pytest.fixture(scope="module")
def empty_loader(spark):
    """tables.load patched so documents/embeddings/events are empty
    DataFrames with the REAL schemas (derived from the sf0.001 files)."""
    import pmc_conversion_spark.tables as T
    real = {name: T.load(spark, SF_DIR, name)
            for name in ("documents", "embeddings", "events")}
    empty = {name: spark.createDataFrame([], df.schema)
             for name, df in real.items()}
    orig = T.load

    def fake(spark_, sf, name):
        if name in empty:
            return empty[name]
        return orig(spark_, sf, name)

    T.load = fake
    yield
    T.load = orig


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_operator_survives_empty_input(spark, empty_loader, name):
    out = queries()[name](spark, SF_DIR)
    rows = out.collect()          # must not raise
    # row-wise operators yield nothing; global aggregates may yield
    # their empty-shape row — either way no nulls crash downstream
    assert isinstance(rows, list)
