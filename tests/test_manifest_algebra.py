"""Manifest algebra in the reference's unit-test style
(tests/test_sync.py:10-122): tmp-dir fixtures with data+sidecar files,
one deliberately corrupt; pairing, orphan detection, checksum mismatch,
dir-diff, digest determinism.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from pmc_conversion_spark.operators import aggregates as A
from pmc_conversion_spark.operators import joins as J
from pmc_conversion_spark.sources import scans as S


@pytest.fixture()
def dropzone(tmp_path):
    """3 data files with sidecars (one corrupt), one hidden file, one
    orphan sidecar, one file missing its sidecar — the reference's
    test_sync fixture shape."""
    files = {
        "clinic/a.tsv": b"alpha\n",
        "clinic/b.tsv": b"beta\n",
        "studies/c.csv": b"gamma\n",
        "studies/nosidecar.csv": b"delta\n",
        "clinic/.hidden": b"x",
    }
    for rel, content in files.items():
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(content)
    for rel in ("clinic/a.tsv", "studies/c.csv"):
        digest = hashlib.sha1(files[rel]).hexdigest()
        (tmp_path / (rel + ".sha1")).write_text(f"{digest}  {rel}\n")
    # corrupt sidecar for b.tsv (test_sync.py:42-44 deliberate mismatch)
    (tmp_path / "clinic/b.tsv.sha1").write_text("0" * 40 + "\n")
    (tmp_path / "studies/orphan.sha1").write_text("1" * 40 + "\n")
    return str(tmp_path)


def test_scan_manifest_excludes_hidden_and_sidecars(spark, dropzone):
    paths = {r.path for r in S.scan_dir_recursive(spark, dropzone).collect()}
    assert paths == {"clinic/a.tsv", "clinic/b.tsv", "studies/c.csv",
                     "studies/nosidecar.csv"}


def test_computed_sha1_matches_hashlib(spark, dropzone):
    m = {r.path: r.sha1
         for r in S.manifest_with_checksums(spark, dropzone).collect()}
    assert m["clinic/a.tsv"] == hashlib.sha1(b"alpha\n").hexdigest()


def test_sidecar_pairing_and_orphans(spark, dropzone):
    # full listing incl. sidecars, excl. hidden
    df = (spark.read.format("binaryFile")
          .option("recursiveFileLookup", "true").load(dropzone))
    prefix = "file:" + os.path.abspath(dropzone)
    rel = F.expr(f"substring(path, {len(prefix) + 2})")
    base = F.substring_index(rel, "/", -1)
    manifest = (df.filter(~base.startswith("."))
                .select(rel.alias("path")))
    pairs = J.pair_sidecars(manifest).collect()
    assert {(p.data_path, p.checksum_path) for p in pairs} == {
        ("clinic/a.tsv", "clinic/a.tsv.sha1"),
        ("clinic/b.tsv", "clinic/b.tsv.sha1"),
        ("studies/c.csv", "studies/c.csv.sha1")}
    problems = {(r.path, r.problem)
                for r in J.sidecar_orphans(manifest).collect()}
    assert problems == {("studies/nosidecar.csv", "missing_checksum"),
                        ("studies/orphan.sha1", "orphan_checksum")}


def test_checksum_mismatch_detected(spark, dropzone):
    computed = S.manifest_with_checksums(spark, dropzone)
    declared = S.scan_sidecar_checksum(spark, dropzone)
    prefix = "file:" + os.path.abspath(dropzone)
    declared = declared.select(
        F.expr(f"substring(path, {len(prefix) + 2}, "
               f"length(path) - {len(prefix) + 1} - 5)").alias("path"),
        "sha1")
    bad = J.checksum_mismatches(computed, declared).collect()
    # b.tsv corrupt; nosidecar.csv has no declared digest; the orphan
    # sidecar declares a digest for a data file that does not exist
    assert {r.path for r in bad} == {"clinic/b.tsv", "studies/nosidecar.csv",
                                     "studies/orphan"}


def test_dirdiff_and_digest_stability(spark, fixture_df):
    old = fixture_df([("a", "h1"), ("b", "h2")], "path string, sha1 string")
    new = fixture_df([("a", "h1"), ("b", "h2x"), ("c", "h3")],
                     "path string, sha1 string")
    diff = {(r.path, r.sha1): r.change
            for r in J.dirdiff(old, new).collect()}
    assert diff == {("a", "h1"): "unchanged",
                    ("b", "h2"): "remove", ("b", "h2x"): "add",
                    ("c", "h3"): "add"}
    # digest is order/partitioning-insensitive
    d1 = A.manifest_digest(old).collect()[0].digest
    d2 = A.manifest_digest(old.repartition(5)).collect()[0].digest
    assert d1 == d2 == "a h1\nb h2"


def test_set_equality(spark, fixture_df):
    a = fixture_df([("a", "1"), ("b", "2")], "path string, sha1 string")
    b = fixture_df([("b", "2"), ("a", "1")], "path string, sha1 string")
    c = fixture_df([("a", "1")], "path string, sha1 string")
    assert A.set_equality(a, b).collect()[0].in_sync is True
    assert A.set_equality(a, c).collect()[0].in_sync is False
