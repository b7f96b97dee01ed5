"""Corpus-hygiene scrubbing operators (beyond-reference; SURVEY §7.1 M7):
PII redaction and corpus-level boilerplate n-gram removal over the
``documents`` table — the two cleanup passes every LLM training pipeline
runs between raw crawl and tokenizer.

Both are pure ``pyspark.sql.functions`` (regexp + array higher-order
functions) — zero Python UDFs. PII redaction is a per-row map (no shuffle at
all: it composes with the curation verdict into the same codegen stage);
boilerplate detection is the C4-style corpus-frequency pass (one explode +
one partial-aggregated shuffle).

Regex portability contract: the patterns below restrict themselves to the
syntax subset Java regex (Spark) and RE2 (DuckDB) evaluate identically —
ASCII classes, bounded repetition, ``\\b`` word boundaries; no backrefs, no
lookaround. The DuckDB oracles interpolate the SAME constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ensure_parallelism
from .text import tokens, word_ngrams

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: (name, pattern, replacement token) applied IN ORDER. Patterns are mutually
#: non-overlapping by construction (an email never parses as a dotted quad;
#: a 3-2-4 id never parses as an E.164 phone), so match counts are
#: order-independent even though replacement is sequential. Replacement
#: tokens contain no digits or '@' so a redaction can never create a new
#: match for a later pattern.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{7,15}\b", "<PHONE>"),
    ("ip", r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b", "<IP>"),
    ("id", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
)


def scrubbed_text(text_col: str = "text") -> Column:
    """The redacted text column (sequential pattern application)."""
    c = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact PII and report per-document evidence: one match count per
    pattern, the total, and md5/length of the scrubbed text (the md5 is what
    the oracle recomputes — proving byte-identical redaction, not just equal
    counts).

    At 100 TB this is a pure scan stage: regexp work rides whole-stage
    codegen, nothing shuffles, and the scrubbed column replaces the raw one
    in the output parquet so downstream stages never see the unredacted
    bytes."""
    df = ensure_parallelism(df)
    clean = scrubbed_text(text_col)
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    total = sum(
        (F.col(f"n_{name}") for name, _, _ in PII_PATTERNS[1:]),
        F.col(f"n_{PII_PATTERNS[0][0]}"),
    )
    return df.select(id_col, *counts, F.md5(clean).alias("clean_md5"),
                     F.length(clean).cast("long").alias("clean_len")).select(
        id_col,
        *[f"n_{name}" for name, _, _ in PII_PATTERNS],
        total.cast("long").alias("n_redacted"),
        "clean_md5",
        "clean_len",
    )


# ---------------------------------------------------------------------------
# Boilerplate n-grams (C4-style corpus-frequency cleanup)
# ---------------------------------------------------------------------------

#: boilerplate = a word BOILER_N-gram occurring in ≥ BOILER_MIN_DOCS distinct
#: documents (navigation chrome, license headers, templated footers).
BOILER_N = 5
BOILER_MIN_DOCS = 3


def _doc_ngrams(text_col: str) -> Column:
    """Distinct word n-grams per document (space-joined strings; linear-time
    ``word_ngrams`` construction — see its docstring for the lambda-CSE
    trap the old transform-over-indices form fell into)."""
    return F.array_distinct(word_ngrams(tokens(text_col), BOILER_N))


def _boiler_list(ex: DataFrame) -> DataFrame:
    """(ngram, n_docs) boilerplate aggregation over an exploded
    doc-distinct gram stream — THE definition of boilerplate (document
    frequency ≥ BOILER_MIN_DOCS), shared by ``boilerplate_ngrams`` and
    ``boilerplate_profile`` so the list and the per-doc attribution can
    never desynchronize. Per-doc grams are pre-distincted map-side, so the
    count after one explode IS the document frequency — no count(distinct)
    shuffle; the HAVING filter collapses the result to the (small)
    boilerplate set before anything downstream consumes it."""
    return (
        ex.groupBy("ngram")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= BOILER_MIN_DOCS)
    )


def boilerplate_ngrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The corpus's boilerplate list: (ngram, n_docs) for every n-gram in
    ≥ BOILER_MIN_DOCS distinct docs (see ``_boiler_list``)."""
    df = ensure_parallelism(df)
    return _boiler_list(df.select(F.explode(_doc_ngrams(text_col)).alias("ngram")))


def boilerplate_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document boilerplate contamination: how many of the doc's distinct
    n-grams are corpus boilerplate, in count and basis points — the signal a
    cleanup pass thresholds on (drop the gram, or the whole template-stamped
    doc).

    Shape: TWO passes over the exploded distinct-gram stream — the minimum
    the problem admits (corpus frequencies must exist before they can be
    attributed back to documents). Pass 1 aggregates the boilerplate list;
    pass 2 left-joins the (small, post-HAVING) marker list and aggregates
    n_grams AND n_boiler per doc in ONE groupBy, so there is no separate
    per-doc totals subtree (the previous three-subtree form built the
    5-gram arrays a third time just to take their size) and no final
    doc-level join beyond the cheap id spine that restores zero-gram docs.
    The marker list is NOT broadcast-hinted — it is unbounded-but-small, so
    AQE downgrades the shuffle join to broadcast exactly when it fits (same
    policy as tfidf's df side)."""
    df = ensure_parallelism(df)
    ex = df.select(id_col, F.explode(_doc_ngrams(text_col)).alias("ngram"))
    boiler = _boiler_list(ex).select("ngram", F.lit(1).alias("_is_b"))
    per_doc = (
        ex.join(boiler, "ngram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.coalesce(F.sum("_is_b"), F.lit(0)).cast("long").alias("n_boiler"),
        )
    )
    spine = df.select(id_col)
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0).cast("long"))
    n_boiler = F.coalesce(F.col("n_boiler"), F.lit(0).cast("long"))
    return spine.join(per_doc, id_col, "left").select(
        id_col,
        n_grams.alias("n_grams"),
        n_boiler.alias("n_boiler"),
        F.when(n_grams > 0, F.floor(n_boiler * 10000 / n_grams))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("boiler_bp"),
    )
