"""Text analysis for large-scale training-data pipelines (BASELINE.json
north star): tokenization, language ID, quality scoring, fingerprinting.

Everything is built-in-function only (JVM-side, whole-stage codegen) —
no Python in the hot path; at 100 TB these run as map-only stages with
zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish word/number/punct tokenizer (one token per match)
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: tiny per-language stopword lexicons for the n-gram/stopword heuristic
#: language-ID (deterministic, dependency-free)
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "du", "avec"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "de", "con"),
    "zh": ("de5", "le5", "shi4", "zai4", "he2", "you3", "wo3", "ta1", "zhe4",
           "bu4"),
}


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (empty string -> empty array)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")) \
        .otherwise(F.split(trimmed, r"\s+"))


def token_count_ws(text: Column) -> Column:
    return F.size(ws_tokens(text))


def token_count_bpe(text: Column) -> Column:
    """Count of BPE-ish regex tokens (letters / digit runs / punct)."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), 0))


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0))


def stopword_hits(text: Column, lexicon: tuple[str, ...]) -> Column:
    """Multiset count of lowercase whitespace tokens in the lexicon."""
    lex = F.array(*[F.lit(w) for w in lexicon])
    return F.size(F.filter(ws_tokens(F.lower(text)),
                           lambda t: F.array_contains(lex, t)))


def quality_features(text: Column) -> dict[str, Column]:
    """Raw quality-signal columns (length/token/punct/stopword ratios —
    the standard web-corpus heuristics)."""
    n_chars = F.length(text)
    n_tokens = token_count_ws(text)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": punct_count(text),
        "n_stopwords": stopword_hits(text, LANG_LEXICONS["en"]),
        "mean_token_len": (n_chars - (n_tokens - 1)).cast("double")
        / F.greatest(n_tokens, F.lit(1)).cast("double"),
    }


def lang_id(text: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts
    (deterministic tie-break on language code order; no hits -> 'und')."""
    pairs = [(code, stopword_hits(text, lex))
             for code, lex in sorted(LANG_LEXICONS.items())]
    best = F.greatest(*[hits for _, hits in pairs])
    out = F.lit("und")
    # Reverse order so earlier codes win ties (last when wins in a fold).
    for code, hits in reversed(pairs):
        out = F.when((hits == best) & (best > 0), F.lit(code)).otherwise(out)
    return out


def normalize_for_fingerprint(text: Column) -> Column:
    """Canonical form for near-exact matching: lowercase, strip
    punctuation, collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


#: PII patterns — conservative syntax shared by Java regex and RE2 so
#: the DuckDB oracle replays them verbatim
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def redact_pii(text: Column) -> Column:
    """Scrub obvious PII before a corpus ships to training: emails and
    phone-shaped digit runs become typed placeholder tokens. Map-side
    JVM regex — whole-stage codegen, no Python in the path."""
    t = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(t, PHONE_RE, "<PHONE>")


def fingerprint_md5(text: Column) -> Column:
    """Document fingerprint = md5 of the normalized text (md5 exists in
    both Spark and DuckDB, making the op oracle-checkable; the exact-dedup
    op groups on this)."""
    return F.md5(F.encode(normalize_for_fingerprint(text), "UTF-8"))


def ngram_multiset(tokens: Column, n: int = 3) -> Column:
    """ALL n-gram shingles in order (with repeats) — the multiset the
    repetition signal needs; :func:`shingles` is its distinct form."""
    k = F.size(tokens)
    ngrams = F.transform(
        F.sequence(F.lit(0), k - n),
        lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)))
    whole = F.array(F.concat_ws(" ", tokens))
    return F.when(k >= n, ngrams).otherwise(whole)


def repetition_counts(text: Column, n: int = 3) -> dict[str, Column]:
    """Within-document repetition signal (the duplicate-n-gram quality
    heuristic used on web corpora): total vs distinct n-gram counts.
    Integer-exact — consumers form the ratio; 1 - distinct/total is the
    repeated fraction."""
    ms = ngram_multiset(ws_tokens(F.lower(text)), n)
    return {"n_ngrams_total": F.size(ms),
            "n_ngrams_distinct": F.size(F.array_distinct(ms))}


def shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct n-gram shingles over a token array (each shingle a
    space-joined string); arrays shorter than n yield a single shingle of
    the whole text so short docs still participate."""
    return F.array_distinct(ngram_multiset(tokens, n))


def strip_html(text: Column) -> Column:
    """Strip markup from scraped text: drop tags, decode the five
    ubiquitous entities, collapse whitespace. Regex text is shared with
    the DuckDB oracle; entity decode is plain `replace` (order matters:
    &amp; last among the ampersand forms so '&amp;lt;' decodes as
    '&lt;' text, not a tag)."""
    t = F.regexp_replace(text, r"<[^>]*>", " ")
    for ent, ch in (("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"),
                    ("&gt;", ">"), ("&quot;", '"')):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def chunk_documents(df, text_col: str = "text",
                    id_cols: tuple[str, ...] = ("doc_id",), *,
                    chunk: int = 64, stride: int = 48):
    """Split documents into overlapping token-window chunks (training
    context windows): chunk ``i`` covers tokens ``[i*stride,
    i*stride+chunk)`` of the whitespace tokenization; the final window
    is short rather than padded. Map-side only — sequence+explode, no
    shuffle, no Python; a 100 TB corpus chunks at scan speed and the
    chunk count per doc is ``1 + ceil((n-chunk)/stride)`` so total
    output is bounded by ``n/stride + 1`` rows per doc.

    Emits ``chunk_id`` / ``start_tok`` / ``chunk_text`` / ``n_tokens``
    per window alongside ``id_cols``.
    """
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk and stride must be positive")
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= chunk, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk)) / F.lit(stride)).cast("int") + 1)
    base = df.select(*id_cols, toks.alias("__toks"),
                     n_chunks.alias("__nc"))
    cid = F.col("chunk_id")
    window = F.slice(F.col("__toks"), cid * stride + 1, chunk)
    return (base
            .select(*id_cols, "__toks",
                    F.explode(F.sequence(F.lit(0), F.col("__nc") - 1))
                     .alias("chunk_id"))
            .select(*id_cols,
                    cid.cast("long").alias("chunk_id"),
                    (cid * stride).cast("long").alias("start_tok"),
                    F.array_join(window, " ").alias("chunk_text"),
                    F.size(window).cast("long").alias("n_tokens")))


def canonical_url(url: Column) -> Column:
    """Canonical URL for web-corpus dedup: lowercase scheme+host, strip
    default ports (:80/:443), drop the fragment, remove utm_* tracking
    params, normalize dangling '?'/'&' and a trailing slash. Pure regex
    over JVM built-ins (no parse_url — the regex text is shared
    verbatim with the DuckDB oracle, and RE2 compatibility keeps the
    patterns lookaround-free)."""
    head0 = F.lower(F.regexp_extract(url, r"^[a-zA-Z]+://[^/?#]*", 0))
    head = F.regexp_replace(F.regexp_replace(head0, ":80$", ""),
                            ":443$", "")
    rest = F.regexp_replace(url, r"^[a-zA-Z]+://[^/?#]*", "")
    u1 = F.concat(head, F.regexp_replace(rest, "#.*$", ""))
    u2 = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(u1, "utm_[^&#]*", ""),
                         r"\?&", "?"),
        "[?&]+$", "")
    return F.regexp_replace(u2, "/+$", "")


def char_entropy_bits(text: Column) -> Column:
    """Shannon entropy of the character distribution, in bits — the
    classic gibberish/boilerplate quality signal (low entropy = runs of
    one symbol, high = random noise).

    Computed entirely per-row with array expressions: distinct chars
    are SORTED so the left-fold accumulates terms in one canonical
    order — bit-identical on any partitioning and replayed exactly by
    the oracle's list fold. O(distinct_chars × len) comparisons per
    row, JVM-side, zero shuffle."""
    cs = F.split(text, "")
    n = F.size(cs)
    dl = F.array_sort(F.array_distinct(cs))

    def step(acc, ch):
        p = F.size(F.filter(cs, lambda x: x == ch)).cast("double") / n
        return acc - p * F.log(p) / F.log(F.lit(2.0))

    # empty text -> empty fold -> 0.0 (no division ever runs);
    # "+ 0.0" folds IEEE -0.0 (single-repeated-char docs) to +0.0 so
    # both engines print the same value.
    return F.round(F.aggregate(dl, F.lit(0.0), step), 6) + F.lit(0.0)


def jaro_winkler_pairs_udf():
    """Arrow-batched pandas UDF computing the textbook Jaro-Winkler
    similarity (prefix scale p=0.1 over at most 4 chars, boost
    threshold 0.7) — the match-window/transposition algorithm that no
    built-in Spark expression provides. Vectorized over Arrow record
    batches (never row-at-a-time Python); per-pair cost is
    O(len_a·len_b) on short attribute strings. The DuckDB oracle runs
    its NATIVE jaro_winkler_similarity, so the correctness gate is a
    genuine cross-implementation check of this code against an
    independent C++ implementation."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _jaro(s1: str, s2: str) -> float:
        if s1 == s2:
            return 1.0
        l1, l2 = len(s1), len(s2)
        if l1 == 0 or l2 == 0:
            return 0.0
        md = max(l1, l2) // 2 - 1
        m1 = [False] * l1
        m2 = [False] * l2
        matches = 0
        for i, c in enumerate(s1):
            lo, hi = max(0, i - md), min(l2, i + md + 1)
            for j in range(lo, hi):
                if not m2[j] and s2[j] == c:
                    m1[i] = m2[j] = True
                    matches += 1
                    break
        if matches == 0:
            return 0.0
        t = 0
        k = 0
        for i in range(l1):
            if m1[i]:
                while not m2[k]:
                    k += 1
                if s1[i] != s2[k]:
                    t += 1
                k += 1
        t //= 2
        return (matches / l1 + matches / l2
                + (matches - t) / matches) / 3

    def _jw(s1: str, s2: str) -> float:
        j = _jaro(s1, s2)
        if j > 0.7:
            pl = 0
            for a, b in zip(s1[:4], s2[:4]):
                if a != b:
                    break
                pl += 1
            j = j + pl * 0.1 * (1 - j)
        return j

    def _batch(a, b):
        return pd.Series([_jw(x, y) for x, y in zip(a, b)],
                         dtype="float64")

    # explicit signature: local type hints would be unresolvable
    # strings under `from __future__ import annotations`
    _batch.__annotations__ = {"a": pd.Series, "b": pd.Series,
                              "return": pd.Series}
    return pandas_udf(_batch, DoubleType())
