"""Deduplication operators for training-data pipelines (BASELINE.json
north star): exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (100 TB posture):
- exact dedup is a hash-groupBy on a 16-byte digest — one shuffle of
  (digest, id), never of the document bodies;
- MinHash/LSH shuffles only (band_hash, signature) pairs; candidate
  verification joins shingle *sets* for candidates only, so the
  quadratic Jaccard join is restricted to same-bucket pairs;
- n-gram Jaccard (the exact form) inverts to a shingle -> doc posting
  list and self-joins postings, which is the standard set-similarity
  join; hot shingles are the skew risk, so postings above a frequency
  cap are dropped (they carry almost no Jaccard information).

All hashes are xxhash64 with integer seeds — deterministic across runs
and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pmc_conversion_spark.functions.text import (
    fingerprint_md5, shingles, ws_tokens,
)
from pmc_conversion_spark.util import ensure_parallelism


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups by normalized-text fingerprint.

    Output: (fingerprint, keep_id, dup_id) — one row per *discarded*
    duplicate; the kept representative is the minimum id (deterministic).
    """
    fp = ensure_parallelism(docs).select(
        F.col(id_col), fingerprint_md5(F.col(text_col)).alias("fp"))
    groups = (fp.groupBy("fp")
              .agg(F.min(id_col).alias("keep_id"),
                   F.collect_list(id_col).alias("ids"))
              .filter(F.size("ids") > 1))
    return (groups.select("fp", "keep_id",
                          F.explode("ids").alias("dup_id"))
            .filter(F.col("dup_id") != F.col("keep_id"))
            .select(F.col("fp").alias("fingerprint"), "keep_id", "dup_id"))


def doc_shingles(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) exploded pairs, distinct per doc."""
    docs = ensure_parallelism(docs)
    return (docs.select(F.col(id_col).alias("doc_id"),
                        shingles(ws_tokens(F.lower(F.col(text_col))), n)
                        .alias("sh"))
            .select("doc_id", F.explode("sh").alias("shingle")))


def ngram_jaccard_pairs(docs: DataFrame, *, threshold_num: int = 1,
                        threshold_den: int = 5, n: int = 3,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_posting: int = 10_000) -> DataFrame:
    """Exact n-gram-shingle Jaccard similarity join.

    Returns pairs (doc_a < doc_b) with
    ``jaccard >= threshold_num/threshold_den``, where jaccard =
    |A∩B| / |A∪B| over distinct shingle sets. The threshold test is done
    in integer arithmetic (den*inter >= num*union) so results are exact
    and oracle-comparable — no floating point.

    ``max_posting`` drops shingles appearing in more docs than the cap
    (skew guard; a shingle shared by everything is uninformative and
    would quadratically blow up the self-join at scale).

    Output: (doc_a, doc_b, inter_size, union_size).
    """
    sh_arrays = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        shingles(ws_tokens(F.lower(F.col(text_col))), n).alias("sh"))
    # per-doc set size from the array — no groupBy, no extra shuffle
    sizes = sh_arrays.select("doc_id", F.size("sh").alias("sz"))
    sh = sh_arrays.select("doc_id", F.explode("sh").alias("shingle"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    postings = (sh.join(F.broadcast(freq.filter(F.col("df") > max_posting)
                                    .select("shingle")),
                        "shingle", "left_anti"))
    a = postings.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = postings.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (a.join(b, "shingle")
             .filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("inter_size")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    out = (inter.join(sa, "doc_a").join(sb, "doc_b")
           .withColumn("union_size",
                       F.col("sz_a") + F.col("sz_b") - F.col("inter_size"))
           .filter(threshold_den * F.col("inter_size")
                   >= threshold_num * F.col("union_size"))
           .select("doc_a", "doc_b", "inter_size", "union_size"))
    return out


def minhash_signatures(docs: DataFrame, *, num_hashes: int = 32,
                       n: int = 3, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """MinHash signature per doc: for seed i, min over shingles of
    xxhash64(shingle, i). Output: (doc_id, sig: array<bigint>)."""
    sh = doc_shingles(docs, id_col, text_col, n)
    mins = [F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select("doc_id",
                      F.array(*[F.col(f"h{i}") for i in range(num_hashes)])
                      .alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, *, num_hashes: int = 32,
                      bands: int = 8, n: int = 3,
                      threshold_num: int = 1, threshold_den: int = 5,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, verified exactly.

    Candidate pairs = docs sharing at least one band hash (bands of
    ``num_hashes/bands`` rows each); candidates are then verified with
    the exact shingle-set Jaccard so the output contains no false
    positives (recall depends on the band/row choice — the LSH S-curve).

    Output: (doc_a, doc_b, inter_size, union_size) — same shape as
    :func:`ngram_jaccard_pairs` (its subset).
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must divide into equal bands")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes=num_hashes, n=n,
                             id_col=id_col, text_col=text_col)
    band_cols = [
        F.xxhash64(F.concat_ws(
            ",", F.lit(b),
            *[F.col("sig").getItem(b * rows_per_band + r).cast("string")
              for r in range(rows_per_band)])).alias(f"band{b}")
        for b in range(bands)]
    banded = sig.select("doc_id", *band_cols)
    bucket = banded.select(
        "doc_id",
        F.explode(F.array(*[F.struct(F.lit(b).alias("band"),
                                     F.col(f"band{b}").alias("bh"))
                            for b in range(bands)])).alias("x")
    ).select("doc_id", F.col("x.band").alias("band"), F.col("x.bh").alias("bh"))
    la = bucket.select(F.col("doc_id").alias("doc_a"), "band", "bh")
    lb = bucket.select(F.col("doc_id").alias("doc_b"), "band", "bh")
    candidates = (la.join(lb, ["band", "bh"])
                  .filter(F.col("doc_a") < F.col("doc_b"))
                  .select("doc_a", "doc_b").distinct())

    # Exact verification on candidates only.
    sh = doc_shingles(docs, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (candidates.join(a, "doc_a").join(b, ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b")
             .agg(F.count(F.lit(1)).alias("inter_size")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("union_size",
                        F.col("sz_a") + F.col("sz_b") - F.col("inter_size"))
            .filter(threshold_den * F.col("inter_size")
                    >= threshold_num * F.col("union_size"))
            .select("doc_a", "doc_b", "inter_size", "union_size"))


def simhash64(docs: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """64-bit SimHash over whitespace tokens.

    Per token, xxhash64 gives 64 bits; each bit votes +1/-1; the sign of
    each bit-position sum forms the fingerprint. Implemented as explode →
    per-bit aggregation (map-side combinable) — no UDF.

    Output: (doc_id, simhash: bigint).
    """
    toks = (ensure_parallelism(docs)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(ws_tokens(F.lower(F.col(text_col))))
                    .alias("tok")))
    h = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    # bit b of h: shiftright then &1 -> vote 2*bit-1
    votes = [F.sum(
        (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
    ).alias(f"b{b}") for b in range(64)]
    agg = h.groupBy("doc_id").agg(*votes)
    fp = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1)).otherwise(F.lit(0))
        term = F.shiftleft(bit.cast("bigint"), b)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return agg.select("doc_id", fp.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, *, max_hamming: int = 3,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """SimHash near-duplicate pairs with Hamming distance <= k.

    Candidate generation by the standard block-permutation trick: split
    the 64-bit fingerprint into ``max_hamming+1`` blocks; any pair within
    distance k agrees on >= 1 block (pigeonhole), so an equi-join per
    block finds all candidates; exact popcount filters.

    Output: (doc_a, doc_b, hamming).
    """
    blocks = max_hamming + 1
    width = 64 // blocks
    fp = simhash64(docs, id_col=id_col, text_col=text_col)
    parts = fp.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("blk"),
                     F.shiftright("simhash", i * width)
                     .bitwiseAND(F.lit((1 << width) - 1)).alias("key"))
            for i in range(blocks)])).alias("x")
    ).select("doc_id", "simhash", F.col("x.blk").alias("blk"),
             F.col("x.key").alias("key"))
    a = parts.select(F.col("doc_id").alias("doc_a"),
                     F.col("simhash").alias("sh_a"), "blk", "key")
    b = parts.select(F.col("doc_id").alias("doc_b"),
                     F.col("simhash").alias("sh_b"), "blk", "key")
    cand = (a.join(b, ["blk", "key"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sh_a", "sh_b").distinct())
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cand.withColumn("hamming", hamming)
            .filter(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))
