"""Text-analysis scalar functions for the LLM-data-pipeline surface.

The reference has no string functions (SURVEY.md §2.8) — these are the
Spark-native text ops a training-data pipeline needs over the ``documents``
table: tokenization, language-ID heuristic, quality scoring, fingerprinting.
All are pure Catalyst expressions (JVM-side, whole-stage codegen) and each
has an exact DuckDB-SQL oracle; no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny stopword lists for the n-gram/stopword language heuristic. Kept in
# sync with the SQL oracle strings in registry/text_queries.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")
DE_STOPWORDS = ("der", "die", "das", "und", "zu", "ist", "ein", "mit", "von", "nicht")
FR_STOPWORDS = ("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "sur")


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization; drops empty tokens from repeated spaces."""
    return F.filter(F.split(text, " "), lambda t: t != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens_col(text)).cast("bigint")


def _stop_hits(toks: Column, stopwords: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    toks = tokens_col(text)
    return _stop_hits(toks, stopwords).cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def lang_id_cols(text: Column | str) -> dict[str, Column]:
    """Stopword-hit language scores + argmax prediction (deterministic
    heuristic; ties broken en > de > fr, 'und' = undetermined on 0 hits)."""
    toks = tokens_col(text)
    en = _stop_hits(toks, EN_STOPWORDS)
    de = _stop_hits(toks, DE_STOPWORDS)
    fr = _stop_hits(toks, FR_STOPWORDS)
    pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return {
        "en_hits": en.cast("bigint"),
        "de_hits": de.cast("bigint"),
        "fr_hits": fr.cast("bigint"),
        "pred_lang": pred,
    }


def quality_score_cols(text: Column | str) -> dict[str, Column]:
    """Length / word-length / stopword-ratio quality features + composite.

    Composite = 0.4*stopword_ratio + 0.3*len_score + 0.3*wordlen_score where
    len_score saturates at 200 tokens and wordlen_score is 1 inside the
    'natural prose' 3..8 avg-chars band. Deterministic double math, rounded
    by callers for hash-stability.
    """
    toks = tokens_col(text)
    n_tok = F.greatest(F.size(toks), F.lit(1)).cast("double")
    n_chars = F.length(text).cast("double")
    avg_word_len = (n_chars - (n_tok - 1)) / n_tok  # chars minus separators
    sw = _stop_hits(toks, EN_STOPWORDS).cast("double") / n_tok
    len_score = F.least(n_tok / F.lit(200.0), F.lit(1.0))
    wordlen_score = F.when((avg_word_len >= 3) & (avg_word_len <= 8), F.lit(1.0)).otherwise(F.lit(0.0))
    quality = 0.4 * sw + 0.3 * len_score + 0.3 * wordlen_score
    return {
        "n_tokens": F.size(toks).cast("bigint"),
        "avg_word_len": avg_word_len,
        "stopword_ratio": sw,
        "quality": quality,
    }


# BPE-style pre-tokenizer regex (simplified GPT-2 pattern: contraction
# suffixes, letter runs, digit runs, punctuation runs, each optionally
# space-prefixed). Restricted to constructs with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): no lookahead, no unicode classes.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def bpe_tokens_col(text: Column | str) -> Column:
    """BPE-ish pre-tokenization: the GPT-2-style regex split that BPE
    vocabularies are trained over (token COUNT is the budget metric a
    data pipeline reports; actual merges need a vocab, out of scope)."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_tokens_col(text)).cast("bigint")


# Rabin-Karp rolling-hash fingerprinting. All arithmetic stays below
# 2^63 (h < M, h*B^2 < 7e13), identical in Spark long math and DuckDB
# BIGINT math, so the fingerprints oracle exactly.
ROLL_M = 1_000_000_007
ROLL_B = 257


def token_base_hash(tok: Column) -> Column:
    """Portable per-token base hash (mod ROLL_M): char-code sum plus
    length/first/last weighting — exactly computable in both engines
    (xxhash64/md5-to-int are not portable to DuckDB SQL)."""
    chars = F.filter(F.split(tok, ""), lambda c: c != F.lit(""))
    code_sum = F.aggregate(
        chars, F.lit(0).cast("long"), lambda acc, c: acc + F.ascii(c).cast("long")
    )
    return (
        F.length(tok).cast("long") * 131
        + F.ascii(F.substring(tok, 1, 1)).cast("long") * 31
        + F.ascii(F.substring(tok, -1, 1)).cast("long")
        + code_sum
    ) % F.lit(ROLL_M)


def rolling_hashes(text: Column | str, w: int = 3) -> Column:
    """Rabin-Karp window fingerprints over the token sequence: for each
    position i, H_i = (h_i*B^(w-1) + ... + h_{i+w-1}) mod M — the
    order-SENSITIVE w-gram sketch (Broder-style shingle fingerprints;
    doc_fingerprint is the order-insensitive bag-of-words counterpart).
    Returns an empty array for docs shorter than ``w`` tokens."""
    toks = tokens_col(text)
    hs = F.transform(toks, token_base_hash)
    window = lambda i: sum(  # noqa: E731
        [
            F.element_at(hs, i + j) * F.lit(ROLL_B ** (w - 1 - j))
            for j in range(w)
        ],
        F.lit(0).cast("long"),
    ) % F.lit(ROLL_M)
    return F.when(F.size(toks) < w, F.array().cast("array<long>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.size(toks) - w + 1), window)
    )


def doc_fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 of the sorted distinct token set.

    Word-order-insensitive (bag-of-words identity) — two docs with the same
    vocabulary collide, which is the dedup-candidate behavior we want from a
    cheap fingerprint. Exact-duplicate detection uses md5(text) directly.
    """
    toks = F.array_sort(F.array_distinct(tokens_col(text)))
    return F.md5(F.array_join(toks, " "))


# ---------------------------------------------------------------------------
# PII detection / redaction
# ---------------------------------------------------------------------------

# Patterns stay inside the Java-regex ∩ RE2 common subset (no backrefs,
# no lookaround) so the DuckDB oracle runs them verbatim.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{4}\b"

_PII_RULES = (
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_IPV4_RE, "<IP>"),
    (PII_PHONE_RE, "<PHONE>"),
)


def pii_counts_cols(text: Column | str) -> dict[str, Column]:
    """Per-category PII match counts — the detection report a curation
    pipeline logs before scrubbing."""
    t = F.col(text) if isinstance(text, str) else text
    return {
        "n_emails": F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("bigint"),
        "n_ips": F.regexp_count(t, F.lit(PII_IPV4_RE)).cast("bigint"),
        "n_phones": F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("bigint"),
    }


def pii_scrub(text: Column | str) -> Column:
    """Replace every PII match with a typed placeholder. Email runs first
    so an address's host part is never half-eaten by the IP rule."""
    t = F.col(text) if isinstance(text, str) else text
    for pat, rep in _PII_RULES:
        t = F.regexp_replace(t, pat, rep)
    return t


# ---------------------------------------------------------------------------
# Gopher-style document quality rules
# ---------------------------------------------------------------------------

# Rule thresholds follow the Gopher corpus-filtering recipe (Rae et al.,
# "Scaling Language Models: Methods, Analysis & Insights from Training
# Gopher", appendix A1.1), scaled to the synthetic corpus: word-count
# bounds, mean-word-length band, and a minimum stop-word presence.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MIN_STOP_FRACTION = 0.02


def gopher_quality_cols(text: Column | str) -> dict[str, Column]:
    """The per-rule measurements plus the conjunctive pass flag."""
    toks = tokens_col(text)
    n = F.size(toks).cast("bigint")
    nd = F.greatest(n, F.lit(1)).cast("double")
    mean_len = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast("double")
        / nd
    )
    stop_frac = _stop_hits(toks, EN_STOPWORDS).cast("double") / nd
    passes = (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_MEAN_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_LEN)
        & (stop_frac >= GOPHER_MIN_STOP_FRACTION)
    )
    return {
        "n_words": n,
        "mean_word_len": mean_len,
        "stop_fraction": stop_frac,
        "passes_gopher": passes.cast("int"),
    }
