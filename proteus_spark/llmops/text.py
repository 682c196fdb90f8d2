"""Text analysis operators: token stats, quality scoring, language ID,
fingerprinting.

All pure Catalyst array/string expressions (no UDFs): at 100 TB these run
inside whole-stage codegen, shuffle nothing, and read only the ``text``
column from parquet (column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proteus_spark.functions.texthash import hex_to_long_spark_sql, md5_seeded_sql
from proteus_spark.llmops.dedup import shingles, tokens_col

# BPE-ish tokenizer regex: alpha runs, digit runs, or any single non-space
# symbol — a deterministic stand-in for a subword vocabulary.
BPE_REGEX = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

STOPWORDS = {
    "en": ["the", "a", "is", "of"],
    "es": ["el", "la", "y", "de"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "les", "et", "une"],
}
LANG_PRIORITY = ["en", "es", "de", "fr"]  # deterministic tie-break order


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_unique, n_bpe) — whitespace and BPE-ish counts."""
    t = tokens_col()
    return docs.select(
        "doc_id",
        F.size(t).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("long").alias("n_unique"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_REGEX), F.lit(0)))
        .cast("long")
        .alias("n_bpe"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality: length, punctuation ratio, stopword ratio and a
    composite score — the standard cheap pre-filters of a training-data
    pipeline. Deterministic integer/double arithmetic (oracle-matched)."""
    t = tokens_col()
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_tokens = F.size(t)
    n_stop = F.size(F.filter(t, lambda x: x.isin(*all_stop)))
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w ]", ""))
    stop_ratio = n_stop.cast("double") / n_tokens
    punct_ratio = n_punct.cast("double") / n_chars
    score = F.round(
        F.least(F.lit(1.0), n_tokens.cast("double") / 100.0)
        * (F.lit(1.0) - punct_ratio)
        * (F.lit(0.5) + stop_ratio),
        6,
    )
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        score.alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language guesser: hits per language profile,
    argmax with fixed priority tie-break, 'und' when nothing matches.

    The testdata's text is synthetic word-soup sharing one vocabulary
    across its ``lang`` labels, so accuracy against the label is not the
    point — deterministic, scalable plumbing is (profiles are tiny literal
    lists compiled into codegen, not a join)."""
    t = tokens_col()

    def _hits(ws):
        # single-arg lambda: F.filter treats two-arg lambdas as (value, idx)
        return F.size(F.filter(t, lambda x: x.isin(*ws)))

    hit_cols = {lang: _hits(ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*hit_cols.values())
    guess = F.lit("und")
    for lang in reversed(LANG_PRIORITY):
        guess = F.when(
            (hit_cols[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(guess)
    out = docs.select(
        "doc_id",
        "lang",
        *[hit_cols[lang].cast("long").alias(f"hits_{lang}") for lang in LANG_PRIORITY],
        guess.alias("lang_guess"),
    )
    return out.withColumn(
        "agrees", (F.col("lang_guess") == F.col("lang")).cast("int")
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp_full, fp_min): whole-text 48-bit digest plus a
    min-shingle-hash 'rolling' fingerprint (stable under small appends —
    the winnowing idea with window = whole doc)."""
    full = docs.select(
        "doc_id", F.expr(md5_seeded_sql("text", "fp")).alias("xf")
    ).select("doc_id", F.expr(hex_to_long_spark_sql("xf")).alias("fp_full"))
    sh = shingles(docs)
    mins = (
        sh.select("doc_id", F.expr(md5_seeded_sql("s", "fpmin")).alias("xs"))
        .select("doc_id", F.expr(hex_to_long_spark_sql("xs")).alias("hs"))
        .groupBy("doc_id")
        .agg(F.min("hs").alias("fp_min"))
    )
    return full.join(mins, "doc_id", "left")
