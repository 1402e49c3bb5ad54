"""The portable hash family is the contract between the Spark plans and
the generated DuckDB oracles (functions/dedup.py). These tests pin it
from both sides: golden values, Spark-vs-DuckDB parity on the exact
expressions, and determinism of the seeded constants — so an
accidental change to either side fails here before it flakes the
driver's correctness gate.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from pmc_conversion_spark.functions import dedup as DD

WORDS = ["hello world", "abc def ghi", "", "ünïcode tøkens", "a",
         "the quick brown fox"]


def py_md5_int60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def test_md5_int60_spark_matches_python_and_duckdb(fixture_df):
    df = fixture_df([(w,) for w in WORDS], "s string")
    got = {r.s: r.h for r in
           df.select("s", DD.md5_int60(F.col("s")).alias("h")).collect()}
    duck = dict(duckdb.sql(
        "SELECT s, ('0x' || substr(md5(s), 1, 15))::BIGINT FROM (SELECT "
        "unnest(?::VARCHAR[]) AS s)", params=[WORDS]).fetchall())
    for w in WORDS:
        assert got[w] == py_md5_int60(w) == duck[w]
        assert 0 <= got[w] < (1 << 60)


def test_minhash_ab_deterministic_and_in_range():
    ab1 = DD.minhash_ab(32)
    ab2 = DD.minhash_ab(32)
    assert ab1 == ab2
    assert len(set(ab1)) == 32
    for a, b in ab1:
        assert 1 <= a < DD.MINHASH_PRIME
        assert 0 <= b < DD.MINHASH_PRIME


def test_permutation_family_ansi_safe():
    # worst case a*h30+b must stay far below 2^63 (ANSI overflow = error)
    worst = (DD.MINHASH_PRIME - 1) * (DD.MINHASH_H30 - 1) + DD.MINHASH_PRIME
    assert worst < (1 << 62)


def test_minhash_signatures_golden(fixture_df):
    docs = fixture_df([(1, "the quick brown fox jumps over the lazy dog")],
                      "doc_id long, text string")
    sig = DD.minhash_signatures(docs, num_hashes=4).collect()[0].sig
    # recompute in pure Python: shingles of 3 lowercased ws tokens
    toks = "the quick brown fox jumps over the lazy dog".split()
    shingles = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
    h30 = [py_md5_int60(s) % DD.MINHASH_H30 for s in set(shingles)]
    expect = [min((a * h + b) % DD.MINHASH_PRIME for h in h30)
              for a, b in DD.minhash_ab(4)]
    assert sig == expect


def test_simhash_bits_within_width(fixture_df):
    docs = fixture_df([(1, "alpha beta gamma delta"), (2, "alpha beta")],
                      "doc_id long, text string")
    for r in DD.simhash64(docs).collect():
        assert 0 <= r.simhash < (1 << DD.SIMHASH_BITS)


def test_simhash_golden(fixture_df):
    text = "alpha beta gamma"
    docs = fixture_df([(1, text)], "doc_id long, text string")
    got = DD.simhash64(docs).collect()[0].simhash
    hs = [py_md5_int60(t) for t in text.split()]
    fp = 0
    for b in range(DD.SIMHASH_BITS):
        vote = sum(((h >> b) & 1) * 2 - 1 for h in hs)
        if vote > 0:
            fp |= 1 << b
    assert got == fp
