"""Registry: scalar functions (SURVEY.md §2.8) with DuckDB oracles.

String/date/cast/JSON functions demonstrated on literal fixtures (shared
with the oracle VALUES clause) or on the events table.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pmc_conversion_spark import tables
from pmc_conversion_spark.functions import dates as D
from pmc_conversion_spark.queries import register
from pmc_conversion_spark.queries.manifest import OLD_MANIFEST, _values, fixture_df

# Golden SHA-1 fixture; first string mirrors the reference's unit test
# (tests/test_checksum.py:20-21 expects d3486ae9...). Digests computed
# with hashlib at import time — DuckDB 1.0 has no sha1(), so the oracle
# carries the expected literals.
SHA1_INPUTS = ["Hello world!", "", "pmc-conversion", "15AUG2000"]
SHA1_ROWS = [(s, hashlib.sha1(s.encode()).hexdigest()) for s in SHA1_INPUTS]

SIDECAR_LINES = [
    ("d3486ae9136e7856bc42212385ea797094475802  individual.csv",),
    ("aaaa000000000000000000000000000000000001",),
    ("ffff000000000000000000000000000000000002  sub/dir/biosource.tsv",),
]

DATE_ROWS = [
    ("15AUG2000", "ddMMMyyyy"),
    ("01jan1999", "ddMMMyyyy"),
    ("24/04/2018 0:00:00", "dd/MM/yyyy H:mm:ss"),
    ("15/09/2000 13:45:10", "dd/MM/yyyy H:mm:ss"),
    ("28/11/2017", "dd/MM/yyyy"),
    ("2020-01-31", "yyyy-MM-dd"),
]

MULTI_ROWS = [
    ("BIOM1", "RNA;DNA"),
    ("BIOM2", "WXS;WGS;RNA-seq"),
    ("BIOM3", "CNV"),
]

CAST_ROWS = [("25",), ("-0.037199",), ("1e3",), ("abc",), ("",)]

GENE_ROWS = [("FAM138A|chr1",), ("MIR1302-2|chr9",), ("AL627309.1",)]

TEMPLATE_ROWS = [
    ("8 tasks succeeded", "0", "/logs/run1.log"),
    ("2 tasks failed", "2", "/logs/run2.log"),
]


@register(
    "f_sha1",
    oracle=f"""
    SELECT s, expected AS digest
    FROM {_values(SHA1_ROWS, 's, expected')}
    """)
def f_sha1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHA-1 hex digest (scripts/checksum.py:13-32); golden values match
    the reference's own unit-test vector (tests/test_checksum.py:20-21)."""
    df = fixture_df(spark, [(s,) for s in SHA1_INPUTS], "s string")
    return df.select("s", F.sha1(F.encode(F.col("s"), "UTF-8")).alias("digest"))


@register(
    "f_substr40",
    oracle=f"""
    SELECT line, substr(line, 1, 40) AS sha1
    FROM {_values(SIDECAR_LINES, 'line')}
    """)
def f_substr40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 40 chars of a sidecar line — sidecars may carry a trailing
    ``"  <filename>"`` (scripts/checksum.py:4-10)."""
    df = fixture_df(spark, SIDECAR_LINES, "line string")
    return df.select("line", F.substring("line", 1, 40).alias("sha1"))


@register(
    "f_endswith",
    oracle=f"""
    SELECT path, path LIKE '%.sha1' AS is_sidecar
    FROM {_values(OLD_MANIFEST, 'path, sha1')}
    """)
def f_endswith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``.sha1`` suffix test (scripts/sync.py:15-16)."""
    df = fixture_df(spark, OLD_MANIFEST, "path string, sha1 string")
    return df.select("path", F.col("path").endswith(".sha1").alias("is_sidecar"))


@register(
    "f_concat_suffix",
    oracle=f"""
    SELECT path, path || '.sha1' AS sidecar_path
    FROM {_values(OLD_MANIFEST, 'path, sha1')}
    WHERE path NOT LIKE '%.sha1'
    """)
def f_concat_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected sidecar path = data path + '.sha1' (scripts/sync.py:19-20)."""
    df = fixture_df(spark, OLD_MANIFEST, "path string, sha1 string")
    return (df.filter(~F.col("path").endswith(".sha1"))
            .select("path",
                    F.concat(F.col("path"), F.lit(".sha1")).alias("sidecar_path")))


@register(
    "f_relpath",
    oracle=f"""
    SELECT '/data/dropzone/' || path AS abs_path,
           path AS rel_path
    FROM {_values(OLD_MANIFEST, 'path, sha1')}
    """)
def f_relpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip the parent-dir prefix incl. trailing '/'
    (scripts/sync.py:101-110)."""
    df = fixture_df(spark, OLD_MANIFEST, "path string, sha1 string")
    parent = "/data/dropzone"
    abs_path = F.concat(F.lit(parent + "/"), F.col("path"))
    return df.select(
        abs_path.alias("abs_path"),
        F.expr(f"substring(concat('{parent}/', path), {len(parent) + 2})")
        .alias("rel_path"))


@register(
    "f_basename_hidden",
    oracle=f"""
    SELECT path, split_part(path, '/', -1) AS basename,
           split_part(path, '/', -1) LIKE '.%' AS is_hidden
    FROM {_values(OLD_MANIFEST, 'path, sha1')}
    """)
def f_basename_hidden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """basename + hidden-file test (scripts/sync.py:37-38)."""
    df = fixture_df(spark, OLD_MANIFEST, "path string, sha1 string")
    basename = F.substring_index(F.col("path"), "/", -1)
    return df.select("path", basename.alias("basename"),
                     basename.startswith(".").alias("is_hidden"))


@register(
    "f_to_date_multi",
    oracle=f"""
    SELECT raw, fmt,
           CASE fmt
             WHEN 'ddMMMyyyy' THEN strptime(raw, '%d%b%Y')
             WHEN 'dd/MM/yyyy H:mm:ss' THEN strptime(raw, '%d/%m/%Y %H:%M:%S')
             WHEN 'dd/MM/yyyy' THEN strptime(raw, '%d/%m/%Y')
             WHEN 'yyyy-MM-dd' THEN strptime(raw, '%Y-%m-%d')
           END::DATE AS parsed
    FROM {_values(DATE_ROWS, 'raw, fmt')}
    """)
def f_to_date_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source multi-format date parsing incl. case-insensitive
    ddMMMyyyy (sources_config.json:32,37,88,335; SURVEY §7.4 risk 1)."""
    df = fixture_df(spark, DATE_ROWS, "raw string, fmt string")
    parsed = F.lit(None).cast("date")
    for fmt in D.FORMATS:
        parsed = F.when(F.col("fmt") == fmt,
                        D.to_date_multi(F.col("raw"), fmt)).otherwise(parsed)
    return df.select("raw", "fmt", parsed.alias("parsed"))


@register(
    "f_date_format_iso",
    oracle=f"""
    SELECT raw,
           strftime(CASE fmt
             WHEN 'ddMMMyyyy' THEN strptime(raw, '%d%b%Y')
             WHEN 'dd/MM/yyyy H:mm:ss' THEN strptime(raw, '%d/%m/%Y %H:%M:%S')
             WHEN 'dd/MM/yyyy' THEN strptime(raw, '%d/%m/%Y')
             WHEN 'yyyy-MM-dd' THEN strptime(raw, '%Y-%m-%d')
           END, '%Y-%m-%d') AS iso
    FROM {_values(DATE_ROWS, 'raw, fmt')}
    """)
def f_date_format_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize every source date to ISO in CSR output [ext-contract]."""
    df = fixture_df(spark, DATE_ROWS, "raw string, fmt string")
    parsed = F.lit(None).cast("date")
    for fmt in D.FORMATS:
        parsed = F.when(F.col("fmt") == fmt,
                        D.to_date_multi(F.col("raw"), fmt)).otherwise(parsed)
    return df.select("raw", D.format_iso(parsed).alias("iso"))


MULTI_EXPECT = [(i, p + 1, v) for i, vals in MULTI_ROWS
                for p, v in enumerate(vals.split(";"))]


@register(
    "f_split_multi",
    oracle=f"""
    SELECT id, pos, value FROM {_values(MULTI_EXPECT, 'id, pos, value')}
    """)
def f_split_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``;``-separated multi-valued attributes exploded to one row per
    value (biomaterial.tsv:2-3 library_strategy='A;B')."""
    df = fixture_df(spark, MULTI_ROWS, "id string, vals string")
    return (df.select("id", F.posexplode(F.split("vals", ";"))
                      .alias("pos0", "value"))
            .select("id", (F.col("pos0") + 1).cast("bigint").alias("pos"),
                    "value"))


@register(
    "f_cast_double",
    oracle=f"""
    SELECT raw, TRY_CAST(raw AS DOUBLE) AS num
    FROM {_values(CAST_ROWS, 'raw')}
    """)
def f_cast_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric attribute parsing with invalid -> NULL (tumor_percentage
    25, Segment_Mean -0.037199; biosource.tsv:2, pmc_test_WXS.seg:2)."""
    df = fixture_df(spark, CAST_ROWS, "raw string")
    return df.select("raw", F.col("raw").try_cast("double").alias("num"))


@register(
    "f_concat_ws_signal",
    oracle=f"""
    SELECT path || ' ' || sha1 AS line
    FROM {_values(OLD_MANIFEST, 'path, sha1')}
    """)
def f_concat_ws_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``"<path> <sha1>"`` signal lines (luigi-pipeline/main.py:68)."""
    df = fixture_df(spark, OLD_MANIFEST, "path string, sha1 string")
    return df.select(F.concat_ws(" ", "path", "sha1").alias("line"))


@register(
    "f_template_fill",
    oracle=f"""
    SELECT printf('Hi all,\nThe pipeline failed.\nSummary: %s\nErrors: %s\nLog: %s',
                  summary, errors, log_file) AS body
    FROM {_values(TEMPLATE_ROWS, 'summary, errors, log_file')}
    """)
def f_template_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template substitution for the error-report email body
    (scripts/email_client.py:96-102; templates/template_email.txt:5-17)."""
    df = fixture_df(spark, TEMPLATE_ROWS,
                     "summary string, errors string, log_file string")
    return df.select(F.format_string(
        "Hi all,\nThe pipeline failed.\nSummary: %s\nErrors: %s\nLog: %s",
        "summary", "errors", "log_file").alias("body"))


@register(
    "f_json_parse",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """)
def f_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON attribute extraction over the events props column (config
    files are JSON in the reference; engine exposes from_json for data)."""
    e = tables.load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"))


@register(
    "f_regexp_gene",
    oracle=f"""
    SELECT raw, split_part(raw, '|', 1) AS gene
    FROM {_values(GENE_ROWS, 'raw')}
    """)
def f_regexp_gene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gene symbol normalization ``FAM138A|chr1`` -> ``FAM138A``
    (archived NGS matrices, all_data_by_genes.txt:3)."""
    df = fixture_df(spark, GENE_ROWS, "raw string")
    return df.select("raw", F.split("raw", "\\|").getItem(0).alias("gene"))


@register(
    "f_edit_distance",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    """)
def f_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance over all nation-name pairs — the fuzzy
    match primitive for id reconciliation (integer-exact on both
    engines)."""
    n = tables.load(spark, sf_dir, "nation")
    a = n.select(F.col("n_nationkey").alias("ka"),
                 F.col("n_name").alias("name_a"))
    b = n.select(F.col("n_nationkey").alias("kb"),
                 F.col("n_name").alias("name_b"))
    return (a.join(b, F.col("ka") < F.col("kb"))
            .select("name_a", "name_b",
                    F.levenshtein("name_a", "name_b").alias("dist")))


@register(
    "agg_mode_value",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS mode_priority FROM (
      SELECT o_orderstatus, o_orderpriority,
             row_number() OVER (PARTITION BY o_orderstatus
                                ORDER BY count(*) DESC,
                                         o_orderpriority ASC) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority)
    WHERE rn = 1
    """)
def agg_mode_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a total-order tie-break (count desc, value
    asc) — stated as count+rank on BOTH engines rather than the native
    mode() aggregates, whose tie behavior differs between engines."""
    o = tables.load(spark, sf_dir, "orders")
    counts = (o.groupBy("o_orderstatus", "o_orderpriority")
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc())
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_orderstatus",
                    F.col("o_orderpriority").alias("mode_priority")))


@register(
    "f_dateshift_deid",
    oracle="""
    WITH off AS (
      SELECT o_orderkey, o_custkey, o_orderdate,
             (('0x' || substr(md5('ds1:' || CAST(o_custkey AS VARCHAR)),
                              1, 15))::BIGINT % 29) - 14 AS shift_days
      FROM orders
    )
    SELECT o_orderkey,
           o_orderdate + shift_days * INTERVAL 1 DAY AS shifted_date,
           shift_days
    FROM off
    """)
def f_dateshift_deid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """De-identification date shifting: every date moves by a
    DETERMINISTIC per-patient offset in [-14, +14] days derived from a
    salted hash of the subject key — the standard clinical de-id
    transform (the reference pipeline feeds a patient registry;
    TranSMART exports must not leak real dates). Per-SUBJECT constancy
    is the whole point: intervals between one subject's events are
    preserved exactly, so longitudinal analyses survive, while
    cross-subject alignment is destroyed. Map-side only, re-run
    stable (a rand() shift would re-deal on every retry).
    Reference: the individual mapping stage of csr2transmart
    (luigi-pipeline config; patient_dimension build)."""
    from pmc_conversion_spark.functions.dedup import md5_int60
    o = tables.load(spark, sf_dir, "orders")
    shift = (md5_int60(F.concat(F.lit("ds1:"),
                                F.col("o_custkey").cast("string")))
             % 29 - 14).alias("shift_days")
    return (o.select("o_orderkey", "o_orderdate", shift)
            .select("o_orderkey",
                    F.timestamp_add("DAY", F.col("shift_days").cast("int"),
                                    F.col("o_orderdate"))
                    .alias("shifted_date"),
                    "shift_days"))


_ACCENT_SRC = "àáâäãåçèéêëìíîïñòóôöõùúûüý"
_ACCENT_DST = "aaaaaaceeeeiiiinooooouuuuy"


@register(
    "f_strip_accents",
    oracle="""
    SELECT n_nationkey,
           'Café-' || n_name || '-Zürich-Ñandú' AS raw,
           strip_accents(lower('Café-' || n_name || '-Zürich-Ñandú'))
             AS normalized
    FROM nation
    """)
def f_strip_accents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accent folding for match keys: planted diacritics normalize to
    ASCII before joining/deduping names — the i18n half of
    record-linkage blocking (``join_fuzzy_blocked`` assumes its keys
    are already folded). The engine uses an explicit translate() map
    (deterministic, no ICU dependency); the oracle uses DuckDB's
    strip_accents — agreeing on the planted character set is exactly
    the contract the fixture pins. Map-side, codegen'd."""
    n = tables.load(spark, sf_dir, "nation")
    raw = F.concat(F.lit("Café-"), F.col("n_name"), F.lit("-Zürich-Ñandú"))
    return n.select("n_nationkey", raw.alias("raw"),
                    F.translate(F.lower(raw), _ACCENT_SRC, _ACCENT_DST)
                    .alias("normalized"))


@register(
    "f_luhn_checksum",
    oracle="""
    WITH acct AS (
      SELECT c_custkey,
             lpad(CAST(c_custkey AS VARCHAR), 8, '0')
               || CAST(c_custkey % 7 AS VARCHAR) AS account_no
      FROM customer
    ), digits AS (
      SELECT c_custkey, account_no,
             list_transform(range(1, length(account_no) + 1),
               i -> CAST(substr(account_no,
                                length(account_no) - i + 1, 1) AS INT))
               AS ds
      FROM acct
    ), summed AS (
      SELECT c_custkey, account_no,
             list_sum(list_transform(range(len(ds)), i ->
               CASE WHEN i % 2 = 1
                    THEN CASE WHEN ds[i+1] * 2 > 9 THEN ds[i+1] * 2 - 9
                              ELSE ds[i+1] * 2 END
                    ELSE ds[i+1] END)) AS s
      FROM digits
    )
    SELECT c_custkey, account_no,
           CASE WHEN s % 10 = 0 THEN 1 ELSE 0 END AS luhn_valid
    FROM summed
    """)
def f_luhn_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn (mod-10) checksum validation over synthetic account
    numbers — the field-level integrity check for card/IMEI-class
    identifiers, complementing the FILE-level sha1 verification the
    reference runs (scripts/checksum.py). Right-to-left digit
    explosion, alternate-position doubling with the 9-subtraction,
    mod-10 verdict — all portable list arithmetic; the mixed fixture
    (checkdigit = key mod 7) yields both verdicts so the oracle pins
    false positives AND negatives."""
    c = tables.load(spark, sf_dir, "customer")
    acct = F.concat(F.lpad(F.col("c_custkey").cast("string"), 8, "0"),
                    (F.col("c_custkey") % 7).cast("string"))
    d = c.select("c_custkey", acct.alias("account_no"),
                 F.reverse(acct).alias("rev"))
    d = d.withColumn(
        "ds", F.expr("transform(sequence(1, length(rev)), "
                     "i -> CAST(substring(rev, i, 1) AS INT))"))
    summed = d.withColumn(
        "s", F.expr("""
          aggregate(transform(sequence(0, size(ds) - 1), i ->
            CASE WHEN i % 2 = 1
                 THEN CASE WHEN ds[i] * 2 > 9 THEN ds[i] * 2 - 9
                           ELSE ds[i] * 2 END
                 ELSE ds[i] END), 0, (acc, x) -> acc + x)"""))
    return summed.select(
        "c_custkey", "account_no",
        F.when(F.col("s") % 10 == 0, 1).otherwise(0).alias("luhn_valid"))


@register(
    "f_ipv4_cidr_match",
    oracle="""
    WITH ip AS (
      SELECT c_custkey,
             ((10 * 16777216)
              + ((c_custkey // 65536) % 256) * 65536
              + ((c_custkey // 256) % 256) * 256
              + (c_custkey % 256)) AS ip_int
      FROM customer
    )
    SELECT c_custkey,
           CAST(ip_int // 16777216 AS VARCHAR) || '.'
             || CAST((ip_int // 65536) % 256 AS VARCHAR) || '.'
             || CAST((ip_int // 256) % 256 AS VARCHAR) || '.'
             || CAST(ip_int % 256 AS VARCHAR) AS ip,
           ip_int,
           CASE WHEN ip_int // 65536 = 10 * 256 + 0
                THEN 1 ELSE 0 END AS in_10_0_16
    FROM ip
    """)
def f_ipv4_cidr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 arithmetic: synthetic 10.x.y.z addresses as 32-bit ints,
    dotted-quad rendering, and CIDR membership (10.0.0.0/16) as a
    prefix integer compare — the network-log primitive (geo/CIDR
    enrichment joins all reduce to integer range/prefix tests once
    addresses are ints, which is also what makes them SORTABLE for
    the range-join and z-order layouts). Pure div/mod arithmetic,
    identical on both engines; no regex parsing in the hot path."""
    c = tables.load(spark, sf_dir, "customer")
    ip_int = (F.lit(10 * 16777216)
              + ((F.col("c_custkey") / 65536).cast("bigint") % 256) * 65536
              + ((F.col("c_custkey") / 256).cast("bigint") % 256) * 256
              + (F.col("c_custkey") % 256)).alias("ip_int")
    t = c.select("c_custkey", ip_int)
    quad = F.concat_ws(
        ".",
        (F.col("ip_int") / 16777216).cast("bigint").cast("string"),
        ((F.col("ip_int") / 65536).cast("bigint") % 256).cast("string"),
        ((F.col("ip_int") / 256).cast("bigint") % 256).cast("string"),
        (F.col("ip_int") % 256).cast("string"))
    return t.select("c_custkey", quad.alias("ip"), "ip_int",
                    F.when((F.col("ip_int") / 65536).cast("bigint")
                           == 10 * 256, 1).otherwise(0).alias("in_10_0_16"))


@register(
    "f_phone_normalize",
    oracle="""
    WITH raw AS (
      SELECT c_custkey,
             CASE c_custkey % 4
               WHEN 0 THEN '(555) ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               WHEN 1 THEN '555.' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '.' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               WHEN 2 THEN '+1 555 ' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || ' ' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
               ELSE '555' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
             END AS raw_phone
      FROM customer
    ), digits AS (
      SELECT c_custkey, raw_phone,
             regexp_replace(raw_phone, '[^0-9]', '', 'g') AS ds
      FROM raw
    )
    SELECT c_custkey, raw_phone,
           CASE WHEN length(ds) = 11 AND substr(ds, 1, 1) = '1'
                THEN '+' || ds
                WHEN length(ds) = 10 THEN '+1' || ds
           END AS e164
    FROM digits
    """)
def f_phone_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phone normalization to E.164: four planted formatting variants
    — parenthesized, dotted, spaced-international, bare — all
    collapse to one +1XXXXXXXXXX key (strip non-digits, then the
    10/11-digit NANP rules; anything else nulls rather than
    guessing). The match-key prerequisite for PII detection
    (``dq_pii_audit``'s phone regex) and identity joins: formats
    differ per source system, the NUMBER is the entity. Map-side
    regex + length rules, both engines identical."""
    c = tables.load(spark, sf_dir, "customer")
    p3 = F.lpad((F.col("c_custkey") % 1000).cast("string"), 3, "0")
    p4 = F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0")
    raw = (F.when(F.col("c_custkey") % 4 == 0,
                  F.concat(F.lit("(555) "), p3, F.lit("-"), p4))
           .when(F.col("c_custkey") % 4 == 1,
                 F.concat(F.lit("555."), p3, F.lit("."), p4))
           .when(F.col("c_custkey") % 4 == 2,
                 F.concat(F.lit("+1 555 "), p3, F.lit(" "), p4))
           .otherwise(F.concat(F.lit("555"), p3, p4)))
    t = c.select("c_custkey", raw.alias("raw_phone"))
    ds = F.regexp_replace("raw_phone", "[^0-9]", "")
    d = t.withColumn("ds", ds)
    e164 = (F.when((F.length("ds") == 11)
                   & (F.substring("ds", 1, 1) == "1"),
                   F.concat(F.lit("+"), F.col("ds")))
            .when(F.length("ds") == 10,
                  F.concat(F.lit("+1"), F.col("ds"))))
    return d.select("c_custkey", "raw_phone", e164.alias("e164"))


@register(
    "f_stable_uuid",
    oracle="""
    WITH h AS (
      SELECT o_orderkey,
             md5('order-ns:' || CAST(o_orderkey AS VARCHAR)) AS x
      FROM orders WHERE o_orderkey < 1000
    )
    SELECT o_orderkey,
           substr(x, 1, 8) || '-' || substr(x, 9, 4) || '-'
             || substr(x, 13, 4) || '-' || substr(x, 17, 4) || '-'
             || substr(x, 21, 12) AS stable_uuid
    FROM h
    """)
def f_stable_uuid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic namespaced UUIDs (v5-style: hash of
    namespace + natural key, rendered 8-4-4-4-12) — the stable
    surrogate identifier that survives re-runs, backfills, and
    cross-system replays where ``uuid()`` would mint a fresh identity
    every time (the same never-rand() reasoning as the split/sample
    family, applied to IDs). Map-side md5 + substring formatting;
    the reference's GUID-keyed transmart rows are the use case
    (patient/observation identifiers must be replay-stable)."""
    o = tables.load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    x = F.md5(F.concat(F.lit("order-ns:"),
                       F.col("o_orderkey").cast("string")))
    t = o.select("o_orderkey", x.alias("x"))
    uuid = F.concat_ws(
        "-",
        F.substring("x", 1, 8), F.substring("x", 9, 4),
        F.substring("x", 13, 4), F.substring("x", 17, 4),
        F.substring("x", 21, 12))
    return t.select("o_orderkey", uuid.alias("stable_uuid"))


@register(
    "f_slugify",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             substr(text, 1, 40) AS title
      FROM documents
    )
    SELECT doc_id, title,
           trim(BOTH '-' FROM regexp_replace(regexp_replace(
               lower(title), '[^a-z0-9]+', '-', 'g'), '-+', '-', 'g'))
             AS slug
    FROM raw
    """)
def f_slugify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL slug generation: titles fold to lowercase, non-alphanumeric
    runs collapse to single dashes, edges trim — the
    content-addressing key every CMS/doc store derives, and (like the
    accent/phone normalizers) a MATCH key: two titles that slug
    identically are the same article to a router. Pure regex chain,
    identical semantics both engines, map-side."""
    d = tables.load(spark, sf_dir, "documents")
    t = d.select("doc_id", F.substring("text", 1, 40).alias("title"))
    slug = F.regexp_replace(
        F.regexp_replace(F.lower("title"), "[^a-z0-9]+", "-"),
        "-+", "-")
    slug = F.regexp_replace(F.regexp_replace(slug, "^-", ""), "-$", "")
    return t.select("doc_id", "title", slug.alias("slug"))


@register(
    "f_url_parse",
    oracle="""
    WITH u AS (
      SELECT o_orderkey,
             'https://shop' || CAST(o_orderkey % 5 AS VARCHAR)
               || '.example.com/cat/' || CAST(o_orderkey % 17 AS VARCHAR)
               || '/item?id=' || CAST(o_orderkey AS VARCHAR)
               || '&page=' || CAST(o_orderkey % 3 AS VARCHAR) AS url
      FROM orders
    )
    SELECT o_orderkey, url,
           regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]id=([^&]*)', 1) AS q_id
    FROM u
    """)
def f_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — scheme/host/path and one query parameter —
    with Spark's JVM-side ``parse_url`` (whole-stage codegen; the
    native URL parser every log/clickstream pipeline leans on). The
    oracle decomposes the same synthetic URLs with regexes, so the
    native parser's semantics are pinned against an independent
    implementation. Map-only; zero Python."""
    o = tables.load(spark, sf_dir, "orders")
    url = F.concat(
        F.lit("https://shop"), (F.col("o_orderkey") % 5).cast("string"),
        F.lit(".example.com/cat/"),
        (F.col("o_orderkey") % 17).cast("string"),
        F.lit("/item?id="), F.col("o_orderkey").cast("string"),
        F.lit("&page="), (F.col("o_orderkey") % 3).cast("string"))
    t = o.select("o_orderkey", url.alias("url"))
    return t.select(
        "o_orderkey", "url",
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("scheme"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("q_id"))


@register(
    "f_base64_roundtrip",
    oracle="""
    SELECT c_custkey, c_name,
           base64(encode(c_name)) AS b64,
           CASE WHEN decode(from_base64(base64(encode(c_name)))) = c_name
                THEN 1 ELSE 0 END AS roundtrip_ok,
           octet_length(from_base64(base64(encode(c_name)))) AS n_bytes
    FROM customer
    """)
def f_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 encode/decode round-trip integrity over a string column —
    the blob-transport primitive (media bytes and model weights ride
    pipelines base64-armored more often than anyone admits). Spark's
    ``base64``/``unbase64`` against DuckDB's ``base64``/``from_base64``
    pins RFC 4648 agreement including padding. Map-only built-ins."""
    c = tables.load(spark, sf_dir, "customer")
    b64 = F.base64(F.col("c_name").cast("binary"))
    return c.select(
        "c_custkey", "c_name", b64.alias("b64"),
        F.when(F.unbase64(b64).cast("string") == F.col("c_name"), 1)
        .otherwise(0).alias("roundtrip_ok"),
        F.octet_length(F.unbase64(b64)).cast("long").alias("n_bytes"))


@register(
    "f_interval_arithmetic",
    oracle="""
    WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS od
               FROM orders)
    SELECT od,
           CAST(od + INTERVAL 1 MONTH AS DATE) AS next_month,
           last_day(od) AS month_end,
           CAST(date_diff('day', date_trunc('month', od),
                          last_day(od)) + 1 AS BIGINT) AS days_in_month,
           CAST(quarter(od) AS BIGINT) AS qtr,
           CAST(date_diff('day', od, DATE '1998-12-31') AS BIGINT)
             AS days_to_epoch_end
    FROM d
    """)
def f_interval_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-interval arithmetic with the end-of-month edge cases
    pinned: add_months clamps Jan 31 + 1 month to Feb 29/28 (both
    engines agree — the off-by-three-days bug every hand-rolled
    '+30 days' hides), last_day, days-in-month via month-truncation,
    quarter, and day distance to a fixed horizon. All JVM date
    built-ins, map-only over the distinct date dimension."""
    o = tables.load(spark, sf_dir, "orders")
    d = o.select(F.to_date("o_orderdate").alias("od")).distinct()
    return d.select(
        "od",
        F.add_months("od", 1).alias("next_month"),
        F.last_day("od").alias("month_end"),
        (F.datediff(F.last_day("od"), F.trunc("od", "month")) + 1)
        .cast("long").alias("days_in_month"),
        F.quarter("od").cast("long").alias("qtr"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("od"))
        .cast("long").alias("days_to_epoch_end"))


@register(
    "f_map_functions",
    oracle="""
    SELECT o_orderkey,
           'prio=' || lower(split_part(o_orderpriority, '-', 2))
             || ',status=' || lower(o_orderstatus) AS kept_entries,
           2 AS n_keys
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
    """)
def f_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column algebra: build a map from row fields
    (map_from_arrays), normalize every value (transform_values),
    filter entries by predicate (map_filter), then export as a
    key-sorted ``k=v,...`` string — the canonical trick for making
    map output comparable across engines, since map iteration order
    is unspecified everywhere. All JVM higher-order functions,
    map-only."""
    o = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus").isin("O", "F"))
    m = F.map_from_arrays(
        F.array(F.lit("status"), F.lit("prio"), F.lit("drop_me")),
        F.array(F.col("o_orderstatus"),
                F.split(F.col("o_orderpriority"), "-")[1],
                F.lit("x")))
    cleaned = F.map_filter(
        F.transform_values(m, lambda k, v: F.lower(v)),
        lambda k, v: k != F.lit("drop_me"))
    entries = F.array_join(
        F.transform(F.sort_array(F.map_entries(cleaned)),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"])),
        ",")
    return o.select(
        "o_orderkey",
        entries.alias("kept_entries"),
        F.size(F.map_keys(cleaned)).alias("n_keys"))


#: Golden soundex vectors from the classic algorithm's published
#: examples (Odell-Russell; the NARA standard examples). DuckDB has no
#: soundex(), so the oracle carries expected literals — the same
#: golden-fixture pattern as f_sha1.
SOUNDEX_ROWS = [
    ("Robert", "R163"), ("Rupert", "R163"),
    ("Ashcraft", "A261"), ("Ashcroft", "A261"),
    ("Tymczak", "T522"), ("Pfister", "P236"),
    ("Honeyman", "H555"), ("Smith", "S530"),
    ("Smyth", "S530"), ("Washington", "W252"),
]


@register(
    "f_soundex_golden",
    oracle=f"""
    SELECT name, expected AS code,
           CASE WHEN TRUE THEN expected END IS NOT NULL AS match_pair
    FROM {_values(SOUNDEX_ROWS, 'name, expected')}
    """)
def f_soundex_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic encoding via Spark's native ``soundex`` pinned against
    the algorithm's published golden vectors (incl. the tricky
    adjacent-same-code collapses: Pfister→P236, Tymczak→T522,
    Ashcraft→A261) — the name-matching primitive that complements
    edit distance in entity resolution: soundex BLOCKS candidate
    pairs cheaply, edit distance verifies them."""
    df = fixture_df(spark, SOUNDEX_ROWS, "name string, expected string")
    return df.select(
        "name", F.soundex("name").alias("code"),
        (F.soundex("name") == F.col("expected")).alias("match_pair"))


@register(
    "f_printf_format",
    oracle="""
    SELECT o_orderkey,
           printf('ORD-%08d', o_orderkey) AS padded_id,
           printf('%.2f USD', round(o_totalprice, 2)) AS price_label,
           printf('%s/%d', o_orderstatus, o_orderkey % 10) AS bucket_tag
    FROM orders WHERE o_orderkey % 13 = 0
    """)
def f_printf_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style formatting pinned across engines (Spark format_string ≙
    DuckDB printf): zero-padded ids, fixed-decimal money labels,
    composed tags — the display normalization layer whose %08d/%.2f
    conventions must agree wherever two systems render the same key.
    Map-only."""
    o = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 13 == 0)
    return o.select(
        "o_orderkey",
        F.format_string("ORD-%08d", "o_orderkey").alias("padded_id"),
        F.format_string("%.2f USD", F.round("o_totalprice", 2))
        .alias("price_label"),
        F.format_string("%s/%d", "o_orderstatus",
                        F.col("o_orderkey") % 10).alias("bucket_tag"))


@register(
    "f_array_hof",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             (CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS toks
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT doc_id,
           len(toks) AS n_tok,
           len(list_filter(toks, x -> length(x) > 4)) AS n_long,
           CASE WHEN len(toks) = 0 THEN 0
                ELSE list_reduce(list_transform(toks, x -> length(x)),
                                 (acc, x) -> acc + x) END AS total_chars,
           list_contains(toks, 'spark') AS has_spark,
           len(list_filter(toks,
               x -> NOT regexp_matches(x, '^[a-z]+$'))) = 0 AS all_alpha,
           array_to_string(list_sort(list_distinct(toks))[1:3], ',')
             AS first3_sorted
    FROM t
    """)
def f_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order array-function surface exported as one entry:
    transform (per-element map), filter (predicate subset), a
    left-fold aggregate (sequential, so the integer total is
    order-identical on both engines), exists-membership, a forall
    expressed as an empty-violations filter, and sorted-distinct
    slicing. HOFs run INSIDE the JVM row — no explode, no shuffle, no
    Python — which is why array columns are the right carrier for
    per-document token data at 100 TB: the alternative explode/groupBy
    costs a shuffle per derived statistic."""
    d = tables.load(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 0)
    from pmc_conversion_spark.functions.text import ws_tokens
    t = d.select("doc_id", ws_tokens(F.lower(F.col("text"))).alias("toks"))
    return t.select(
        "doc_id",
        F.size("toks").alias("n_tok"),
        F.size(F.filter("toks", lambda x: F.length(x) > 4)).alias("n_long"),
        F.aggregate(F.transform("toks", lambda x: F.length(x)),
                    F.lit(0), lambda acc, x: acc + x).alias("total_chars"),
        F.array_contains("toks", "spark").alias("has_spark"),
        (F.size(F.filter("toks",
                         lambda x: ~x.rlike("^[a-z]+$"))) == 0)
        .alias("all_alpha"),
        F.array_join(F.slice(F.array_sort(F.array_distinct("toks")), 1, 3),
                     ",").alias("first3_sorted"))


@register(
    "f_try_arithmetic",
    oracle="""
    SELECT o_orderkey,
           round(CASE WHEN o_orderkey % 5 = 0 THEN NULL
                 ELSE o_totalprice / (o_orderkey % 5) END, 4) AS safe_div,
           CAST(CASE WHEN o_orderkey = 0
                THEN 9223372036854775807 END AS BIGINT) AS overflow_add,
           CAST(CASE WHEN o_orderkey % 4 = 0 THEN 0
                     WHEN o_orderkey % 4 = 1 THEN 4611686018427387904
                END AS BIGINT) AS overflow_mul
    FROM orders WHERE o_orderkey % 11 = 0
    """)
def f_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe arithmetic: ``try_divide`` /``try_add`` /
    ``try_multiply`` return NULL instead of raising on division by
    zero and bigint overflow — the semantics batch pipelines need so
    one poisoned row quarantines itself instead of killing a 10-hour
    job (Spark 4 runs ANSI ON by default, where plain operators
    THROW). The oracle replays each null-producing condition as an
    explicit CASE, pinning exactly which rows degrade. Map-only."""
    o = tables.load(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 11 == 0)
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(F.col("o_totalprice").cast("double"),
                             (F.col("o_orderkey") % 5).cast("double")), 4)
        .alias("safe_div"),
        F.try_add(F.lit(9223372036854775807),
                  F.col("o_orderkey")).alias("overflow_add"),
        F.try_multiply(F.lit(4611686018427387904),
                       F.col("o_orderkey") % 4).alias("overflow_mul"))


@register(
    "f_collation_ci",
    oracle="""
    WITH variants AS (
      SELECT n_name AS name FROM nation
      UNION ALL SELECT lower(n_name) FROM nation
      UNION ALL SELECT upper(n_name) FROM nation WHERE n_nationkey < 10
    )
    SELECT min(lower(name)) AS k, count(*) AS n,
           count(DISTINCT name) AS n_case_variants
    FROM variants
    GROUP BY lower(name)
    """)
def f_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4's COLLATE UNICODE_CI): the
    mixed-case variants of each nation name land in ONE group under
    the case-insensitive collation — the engine-level answer to the
    lower()-everywhere idiom (collation survives into joins, distinct
    and sort orders, and unlike lower() it composes with locale rules
    beyond ASCII). The emitted key is min(lower(name)) so the group
    representative is deterministic; the distinct-variant count
    proves >1 casing actually merged. Oracle replays the equivalence
    with lower() grouping — identical partitions for this ASCII
    domain."""
    nation = tables.load(spark, sf_dir, "nation")
    variants = (nation.select(F.col("n_name").alias("name"))
                .unionAll(nation.select(F.lower("n_name").alias("name")))
                .unionAll(nation.filter(F.col("n_nationkey") < 10)
                          .select(F.upper("n_name").alias("name"))))
    return (variants
            .groupBy(F.expr("name COLLATE UNICODE_CI").alias("ck"))
            .agg(F.min(F.lower("name")).alias("k"),
                 F.count(F.lit(1)).alias("n"),
                 F.countDistinct("name").alias("n_case_variants"))
            .select("k", "n", "n_case_variants"))


KV_ROWS = [
    (1, "retries=3;timeout=30;mode=fast"),
    (2, "timeout=60;mode=safe"),
    (3, "retries=1"),
    (4, ""),
]


@register(
    "udtf_dynamic_schema",
    oracle=f"""
    SELECT id AS row_id,
           nullif(regexp_extract(cfg, 'retries=([^;]*)', 1), '')
             AS retries,
           nullif(regexp_extract(cfg, 'mode=([^;]*)', 1), '') AS mode
    FROM {_values(KV_ROWS, 'id, cfg')}
    """)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 3.5+/4): the ``analyze()``
    static method runs at PLAN time and derives the output schema
    from a constant argument — here ``array('retries','mode')``
    becomes two typed output COLUMNS — which static UDTFs (fixed
    returnType, udtf_sentence_split) cannot express. This is the
    config-shredding / dynamic-pivot shape: callers choose the
    projection per query, the optimizer sees real named columns (so
    downstream pruning works), and missing keys surface as NULLs.
    eval() itself stays a cheap per-row generator."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructType

    class KvExpand:
        @staticmethod
        def analyze(rid, cfg, keys):
            st = StructType().add("row_id", LongType())
            for k in keys.value:
                st = st.add(k, StringType())
            from pyspark.sql.udtf import AnalyzeResult
            return AnalyzeResult(schema=st)

        def eval(self, rid, cfg, keys):
            d = dict(p.split("=", 1)
                     for p in (cfg or "").split(";") if "=" in p)
            yield (rid, *[d.get(k) for k in keys])

    spark.udtf.register("kv_expand", udtf(KvExpand))
    fixture_df(spark, KV_ROWS, "id long, cfg string") \
        .createOrReplaceTempView("kv_cfg_v")
    return spark.sql(
        "SELECT s.* FROM kv_cfg_v t, "
        "LATERAL kv_expand(t.id, t.cfg, array('retries', 'mode')) s")


@register(
    "f_snowflake_id_codec",
    oracle="""
    WITH src AS (
      SELECT event_id, user_id,
             date_diff('millisecond',
                       TIMESTAMP '2024-01-01 00:00:00', ts) AS ms
      FROM events WHERE event_id % 50 = 0
    ),
    enc AS (
      SELECT event_id,
             ms * 4194304 + (user_id % 1024) * 4096
               + (event_id % 4096) AS snowflake,
             ms, user_id % 1024 AS worker, event_id % 4096 AS seq
      FROM src
    )
    SELECT event_id, snowflake,
           snowflake // 4194304 AS ms_decoded,
           (snowflake // 4096) % 1024 AS worker_decoded,
           snowflake % 4096 AS seq_decoded,
           snowflake // 4194304 = ms
             AND (snowflake // 4096) % 1024 = worker
             AND snowflake % 4096 = seq AS roundtrip_ok
    FROM enc
    """)
def f_snowflake_id_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake-style ID codec: pack (custom-epoch milliseconds,
    worker, sequence) into one time-sortable BIGINT — the
    coordination-free distributed ID scheme whose killer property is
    that ORDER BY id ≈ ORDER BY time (so range scans and compactions
    stay time-local without a timestamp column) — and decode it back
    by pure integer arithmetic, proving every field survives. The
    custom 2024 epoch keeps the 22-bit shift far from int64 overflow
    (the reason real deployments never use the unix epoch).
    Multiplication/division by 2²² and 2¹² instead of bit operators
    keeps one text semantics on both engines; map-only."""
    e = tables.load(spark, sf_dir, "events").filter(
        F.col("event_id") % 50 == 0)
    ms = F.expr("timestampdiff(MILLISECOND, "
                "TIMESTAMP '2024-01-01 00:00:00', ts)")
    src = e.select("event_id", "user_id", ms.alias("ms"))
    sf = (F.col("ms") * 4194304 + (F.col("user_id") % 1024) * 4096
          + (F.col("event_id") % 4096))
    enc = src.select(
        "event_id", sf.alias("snowflake"), "ms",
        (F.col("user_id") % 1024).alias("worker"),
        (F.col("event_id") % 4096).alias("seq"))
    ms_d = F.floor(F.col("snowflake") / 4194304)
    worker_d = F.floor(F.col("snowflake") / 4096) % 1024
    seq_d = F.col("snowflake") % 4096
    return enc.select(
        "event_id", "snowflake",
        ms_d.alias("ms_decoded"),
        worker_d.alias("worker_decoded"),
        seq_d.alias("seq_decoded"),
        ((ms_d == F.col("ms")) & (worker_d == F.col("worker"))
         & (seq_d == F.col("seq"))).alias("roundtrip_ok"))


@register(
    "f_jaro_winkler",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    pairs AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b
      FROM names a JOIN names b ON a.p_name < b.p_name
    )
    SELECT name_a, name_b,
           round(jaro_winkler_similarity(name_a, name_b), 4) AS jw
    FROM pairs
    WHERE round(jaro_winkler_similarity(name_a, name_b), 4) >= 0.7
    """)
def f_jaro_winkler(spark, sf_dir: str):
    """JARO-WINKLER similarity over every distinct part-name pair —
    the record-linkage string comparator (match window + transposition
    count + Winkler common-prefix boost) that neither Spark nor ANSI
    SQL ships as a built-in. Implemented as an Arrow-batched pandas
    UDF (functions/text.py jaro_winkler_pairs_udf — the sanctioned
    Python surface, never row-at-a-time); the DuckDB oracle calls its
    NATIVE jaro_winkler_similarity, making this gate a true
    cross-implementation check: a Python re-derivation of the
    algorithm must agree with DuckDB's independent C++ one to 4 dp on
    every pair, including the boost-threshold and zero-match-window
    edge cases. The pair frame is the DISTINCT attribute domain
    (partial-agg first, 64 names → ~2k pairs), so the quadratic stays
    on the value domain, never the row count — the same bounded-domain
    discipline as vocab_spell_variants, and the scale reason this is
    a broadcast nested-loop over a tiny frame at 100 TB."""
    from pmc_conversion_spark.functions.text import jaro_winkler_pairs_udf
    jw = jaro_winkler_pairs_udf()
    names = (tables.load(spark, sf_dir, "part")
             .select("p_name").distinct())
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    pairs = a.join(b, F.col("name_a") < F.col("name_b"))
    scored = pairs.select(
        "name_a", "name_b",
        F.round(jw(F.col("name_a"), F.col("name_b")), 4).alias("jw"))
    return scored.filter(F.col("jw") >= 0.7)


@register(
    "f_mod97_checksum",
    oracle="""
    WITH acct AS (
      SELECT c_custkey,
             lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS body
      FROM customer),
    chk AS (
      SELECT c_custkey, body,
             98 - list_reduce(
               list_transform(
                 regexp_split_to_array(body || '252200', ''),
                 c -> c::INT),
               (a, d) -> (a * 10 + d) % 97) AS check_digits
      FROM acct),
    v AS (
      SELECT c_custkey,
             'PM' || lpad(CAST(check_digits AS VARCHAR), 2, '0')
               || body AS iban,
             check_digits,
             list_reduce(
               list_transform(
                 regexp_split_to_array(
                   body || '2522'
                   || lpad(CAST(check_digits AS VARCHAR), 2, '0'), ''),
                 c -> c::INT),
               (a, d) -> (a * 10 + d) % 97) AS residue
      FROM chk)
    SELECT c_custkey, iban, CAST(check_digits AS BIGINT)
             AS check_digits,
           CAST(residue AS BIGINT) AS residue
    FROM v
    """)
def f_mod97_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO 7064 MOD-97-10 CHECK DIGITS (the IBAN/creditor-reference
    scheme): generate the two check digits for a synthetic 'PM'
    account number per customer and re-validate the assembled
    identifier (residue must be 1 for every row -- the self-check
    the oracle hash pins). Unlike Luhn (`f_luhn_checksum`, catches
    single transpositions), mod-97 catches ALL single errors and all
    adjacent transpositions. The big-number mod runs as a LEFT FOLD
    over the digit expansion -- acc = (acc*10 + d) % 97 -- never
    materializing the 16-digit integer, so it is arbitrary-length
    safe; letters expand to their two-digit values ('P'=25, 'M'=22)
    before the fold. Map-only over customers: zero shuffles."""
    c = tables.load(spark, sf_dir, "customer")
    body = F.lpad(F.col("c_custkey").cast("string"), 10, "0")

    def mod97(scol):
        digits = F.transform(
            F.sequence(F.lit(1), F.length(scol)),
            lambda i: scol.substr(i, F.lit(1)).cast("int"))
        return F.aggregate(digits, F.lit(0),
                           lambda a, d: (a * 10 + d) % 97)

    chk = c.select(
        "c_custkey", body.alias("body"),
        (98 - mod97(F.concat(body, F.lit("252200"))))
        .alias("check_digits"))
    cd2 = F.lpad(F.col("check_digits").cast("string"), 2, "0")
    return chk.select(
        "c_custkey",
        F.concat(F.lit("PM"), cd2, F.col("body")).alias("iban"),
        F.col("check_digits").cast("bigint").alias("check_digits"),
        mod97(F.concat(F.col("body"), F.lit("2522"), cd2))
        .cast("bigint").alias("residue"))


#: Damm quasigroup (the standard order-10 totally antisymmetric
#: table, row-major): step acc -> TBL[acc*10 + digit].
_DAMM_TBL = ("0317598642" "7092154863" "4206871359" "1750983426"
             "6123045978" "3674209581" "5869720134" "8945362017"
             "9438617205" "2581436790")


@register(
    "f_damm_checksum",
    oracle=f"""
    WITH src AS (
      SELECT o_orderkey,
             CAST(o_orderkey AS VARCHAR) AS body
      FROM orders),
    chk AS (
      SELECT o_orderkey, body,
             list_reduce(
               list_prepend(0,
                 list_transform(regexp_split_to_array(body, ''),
                                c -> c::INT)),
               (a, d) -> substr('{_DAMM_TBL}', a * 10 + d + 1, 1)::INT)
               AS check_digit
      FROM src)
    SELECT o_orderkey AS order_id,
           CAST(check_digit AS BIGINT) AS damm_digit,
           body || CAST(check_digit AS VARCHAR) AS protected_id,
           CAST(list_reduce(
             list_prepend(0,
               list_transform(
                 regexp_split_to_array(body
                   || CAST(check_digit AS VARCHAR), ''),
                 c -> c::INT)),
             (a, d) -> substr('{_DAMM_TBL}', a * 10 + d + 1, 1)::INT)
             = 0 AS BOOLEAN) AS verifies
    FROM chk
    """)
def f_damm_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAMM check digit for order ids — the quasigroup checksum that
    (unlike Luhn, `f_luhn_checksum`) detects ALL single-digit errors
    AND all adjacent transpositions, including the 09↔90 family Luhn
    misses, with a single left fold and no weighting cases: acc' =
    Q[acc][d] over the standard order-10 totally antisymmetric
    quasigroup, check digit = final acc (appending it folds to 0,
    which the op verifies per row as the round-trip proof). The fold
    is `F.aggregate` over the digit array with the SAME 100-char
    table literal on both engines (string indexing replaces the 2-D
    lookup); map-side only, no shuffle, trivially parallel."""
    o = tables.load(spark, sf_dir, "orders")
    body = F.col("o_orderkey").cast("string")
    tbl = F.lit(_DAMM_TBL)

    def fold(col):
        return F.aggregate(
            F.split(col, ""), F.lit(0),
            lambda a, d: F.substring(tbl, a * 10 + d.cast("int") + 1,
                                     1).cast("int"))

    chk = o.select(F.col("o_orderkey").alias("order_id"),
                   body.alias("body"), fold(body).alias("damm"))
    return chk.select(
        "order_id",
        F.col("damm").cast("bigint").alias("damm_digit"),
        F.concat(F.col("body"), F.col("damm").cast("string"))
        .alias("protected_id"),
        (fold(F.concat(F.col("body"), F.col("damm").cast("string")))
         == 0).alias("verifies"))
