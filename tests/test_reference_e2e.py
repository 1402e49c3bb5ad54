"""Round-2 surface: real reference files end-to-end + scale-posture
regressions (distributed digest, two-phase surrogate key).

Test style follows the reference (tests/test_sync.py golden values,
error paths): hand-known expected values against the real artifacts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pmc_conversion_spark.functions.dates import strptime_to_java
from pmc_conversion_spark.plans import config_model as CM
from pmc_conversion_spark.plans import reference_e2e as RE
from pmc_conversion_spark.sources.codebook import parse_codebook_text


# ------------------------------------------------------------- parser

def test_codebook_parser_groups_and_quotes():
    text = ("1\tSEX\t\t\r"
            "\t1\tmale\t2\tfemale\t9\tunknown\t\t\r"
            "8\tHOSPREC HOSPDIAG\t\r"
            "\t200\tAMC\t201\tUMCG\r"
            "\t217\tUMCU\r"
            "332\tDIAGCD\r"
            '\t80000\t"Neoplasm, benign"\t80001\t"He said ""hi"""\r')
    rows = parse_codebook_text(text)
    assert ("SEX", "1", "male") in rows
    assert ("SEX", "9", "unknown") in rows
    # group columns fan out: both HOSPREC and HOSPDIAG get every mapping
    assert ("HOSPREC", "217", "UMCU") in rows
    assert ("HOSPDIAG", "217", "UMCU") in rows
    # multi-line group: second mapping line joined the same group
    assert ("HOSPDIAG", "200", "AMC") in rows
    # CSV-style quoting: outer quotes stripped, doubled quotes unescaped
    assert ("DIAGCD", "80000", "Neoplasm, benign") in rows
    assert ("DIAGCD", "80001", 'He said "hi"') in rows


def test_codebook_parser_error_paths():
    with pytest.raises(ValueError, match="before any group"):
        parse_codebook_text("\t1\tmale\r")
    with pytest.raises(ValueError, match="numeric group id"):
        parse_codebook_text("abc\tSEX\r\t1\tmale\r")


def test_real_codebook_golden_values():
    rows = set(__import__("pmc_conversion_spark.sources.codebook",
                          fromlist=["parse_codebook_file"])
               .parse_codebook_file(
                   RE.REF_DROPZONE_FULL + "/studies/individual_codebook.tsv"))
    assert ("SEX", "1", "male") in rows
    assert ("HOSPDIAG", "217", "UMCU") in rows          # hospital decode
    assert ("IFCDATR", "2", "no") in rows               # group 343
    assert ("DIAGCD", "95913", "Malignant lymphoma, non-Hodgkin") in rows


# ------------------------------------------------------- config model

def test_strptime_translation():
    assert strptime_to_java("%d%b%Y") == "ddMMMyyyy"
    assert strptime_to_java("%d/%m/%Y %H:%M:%S") == "dd/MM/yyyy H:mm:ss"
    assert strptime_to_java("%d/%m/%Y") == "dd/MM/yyyy"
    assert strptime_to_java("%Y-%m-%d") == "yyyy-MM-dd"
    # Java-form strings pass through (engine-shaped configs)
    assert strptime_to_java("ddMMMyyyy") == "ddMMMyyyy"
    with pytest.raises(ValueError):
        strptime_to_java("%Q")


def test_real_sources_config_parses():
    cfg = RE.load_sources_config()
    names = {e.name: e for e in cfg.entities}
    assert set(names) == {"Individual", "Diagnosis", "Biosource",
                          "Biomaterial", "Radiology", "Study",
                          "IndividualStudy"}
    # id inference: snake-case convention + the bridge override
    assert names["Individual"].id_attr == "individual_id"
    assert names["Diagnosis"].id_attr == "diagnosis_id"
    assert names["IndividualStudy"].id_attr == "study_id_individual_study_id"
    # strptime formats arrived translated
    bd = names["Individual"].attr("birth_date")
    assert bd.kind == "date"
    assert bd.sources[0].date_format == "ddMMMyyyy"
    # codebooks map folded into per-file format bindings
    assert cfg.fmt("studies/individual.csv").codebook == \
        "studies/individual_codebook.tsv"
    assert cfg.fmt("studies/individual.csv").delimiter == ","
    assert cfg.fmt("clinic/RDP-Patient.tsv").delimiter == "\t"


# ------------------------------------------------------- e2e pipeline

@pytest.mark.slow
def test_real_csr_scale_facts(spark):
    csr = RE.build_csr(spark)
    counts = {k: v.count() for k, v in csr.items()}
    assert counts == {"Individual": 17, "Diagnosis": 19, "Biosource": 21,
                      "Biomaterial": 23, "Radiology": 16, "Study": 2,
                      "IndividualStudy": 17}


def test_real_csr_pat1_decode_and_priority(spark):
    ind = RE.build_csr(spark)["Individual"]
    row = ind.filter(F.col("individual_id") == "PAT1").collect()[0]
    # RDP-Patient wins birth_date (15AUG2000) over individual.csv DTOB
    assert str(row["birth_date"]) == "2000-08-15"
    # Geslacht 'M' decoded via the real RDP-Patient_codebook
    assert row["gender"] == "male"
    assert row["ic_type"] == "expliciete toestemming"


@pytest.mark.slow
def test_alternative_dropzone_drops_pat2(spark):
    csr = RE.build_csr(spark, data_dir=RE.REF_DROPZONE_ALT)
    ind = csr["Individual"]
    assert ind.count() == 16
    assert ind.filter(F.col("individual_id") == "PAT2").count() == 0


# ---------------------------------------------------------- jdbc swap

def test_jdbc_swap_statement_generation():
    """The all-or-nothing publish SQL (README.md:181-183): staged table
    renamed over the live one inside one transaction; identifiers are
    quoted so mixed-case/keyword table names survive."""
    from pmc_conversion_spark.sources.sinks import (
        jdbc_staging_table, jdbc_swap_statements)
    assert jdbc_staging_table("observation_fact") == \
        "observation_fact__staging"
    stmts = jdbc_swap_statements("observation_fact")
    assert stmts == [
        'DROP TABLE IF EXISTS "observation_fact"',
        'ALTER TABLE "observation_fact__staging" RENAME TO '
        '"observation_fact"',
    ]
    # the drop must precede the rename — swap order IS the contract
    assert stmts[0].startswith("DROP") and stmts[1].startswith("ALTER")


# -------------------------------------------------- scale regressions

def test_snapshot_digest_distributed_plan(spark, fixture_df):
    from pmc_conversion_spark.sources.sinks import (
        snapshot_digest, snapshot_digest_plan)
    df = fixture_df([(i, f"v{i}") for i in range(100)], "k int, v string")
    plan = snapshot_digest_plan(df)._jdf.queryExecution() \
        .executedPlan().toString()
    # partial (map-side) aggregation, and no collect_list funnel
    assert "partial_" in plan
    assert "collect_list" not in plan
    # order-insensitive: digest invariant under repartition/shuffle order
    d1, n1 = snapshot_digest(df)
    d2, n2 = snapshot_digest(df.repartition(7).sortWithinPartitions("v"))
    assert (d1, n1) == (d2, n2)
    d3, _ = snapshot_digest(df.filter(F.col("k") != 5))
    assert d3 != d1


def test_surrogate_key_distributed_matches_global(spark, fixture_df):
    from pmc_conversion_spark.operators.windows import (
        surrogate_key, surrogate_key_distributed)
    rows = [(i * 7919 % 1000,) for i in range(1000)]  # scrambled unique
    df = fixture_df(list({r[0] for r in rows} and
                         [(v,) for v in {r[0] for r in rows}]), "k int")
    a = {(r["k"], r["sk"]) for r in surrogate_key(df, "k").collect()}
    b = {(r["k"], r["sk"]) for r in
         surrogate_key_distributed(df, "k", buckets=16).collect()}
    assert a == b
    # the data path is range-bucketed DETERMINISTICALLY (r7: pure
    # hash-sample boundaries, replacing the r6 frozen localCheckpoint),
    # not a global single-partition sort: the end-to-end plan is
    # transparent (no checkpoint scan) and the bucketing REALLY spreads
    # the rows — with 1000 distinct keys and 16 requested buckets the
    # assignment must use many distinct bucket ids (ADVICE r6: assert
    # the actual bucket property, not a vacuous partition count).
    from pmc_conversion_spark.operators.windows import _range_bucketed
    ranged_df = surrogate_key_distributed(df, "k", buckets=16)
    plan = ranged_df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" not in plan
    assert "__bucket" in plan
    n_buckets = (_range_bucketed(df, 16, F.col("k"))
                 .select("__bucket").distinct().count())
    assert 8 <= n_buckets <= 16, n_buckets
