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


# ---------------------------------------------------------------------------
# BM25 relevance scoring
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY_TERMS = ("join", "window", "stream", "hash")


def bm25_search(
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k1: float = BM25_K1,
    b: float = BM25_B,
    topk: int = 20,
) -> DataFrame:
    """BM25 top-k search over the corpus for a fixed term set:
    (doc_id, dl, score).

    Scale shape — ONE explode and ONE shuffle for the per-doc stats:

    - ``wide``: groupBy(doc_id) computes the document length AND one
      conditional count per query term in a single map-side-combined
      aggregation (the query term set is small and fixed, so columns beat
      a (doc, term) posting shuffle);
    - corpus stats (N, avgdl, per-term document frequencies) are one more
      aggregation over ``wide`` — a 1-row broadcast;
    - integer token counts accumulate exactly in doubles (< 2^53), so
      avgdl is summation-order-independent and the final ``round(score,6)``
      is engine-stable.

    Ranking is on the ROUNDED score with doc_id tie-break, so top-k
    membership is deterministic."""
    toks = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    ).select(
        "doc_id", F.explode(tokens_col()).alias("w")
    )
    wide = toks.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.count(F.when(F.col("w") == t, True)).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = F.broadcast(
        wide.agg(
            F.count("*").alias("n"),
            F.avg("dl").alias("avgdl"),
            *[
                F.count(F.when(F.col(f"tf_{i}") > 0, True)).alias(f"df_{i}")
                for i in range(len(terms))
            ],
        )
    )

    def term_score(i: int):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        tf_norm = (tf * (k1 + 1)) / (
            tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        return idf * tf_norm

    any_term = sum(F.col(f"tf_{i}") for i in range(len(terms))) > 0
    scored = (
        wide.crossJoin(stats)
        .filter(any_term)
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("dl"),
            F.round(sum(term_score(i) for i in range(len(terms))), 6).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(topk)


# ---------------------------------------------------------------------------
# Deterministic corpus splitting & repetition analysis
# ---------------------------------------------------------------------------

SPLIT_BUCKETS = 100
SPLIT_VALID_PCT = 10  # buckets [0, 10) -> validation, rest -> train


def train_split(docs: DataFrame, valid_pct: int = SPLIT_VALID_PCT) -> DataFrame:
    """Deterministic train/validation assignment: (doc_id, bucket, split).

    The split key is a content hash (md5 of the text), NOT the doc_id —
    re-ingesting the same corpus with different ids keeps every document in
    its split, and exact duplicates land in the same split (no train/valid
    leakage between copies). Pure codegen expressions; reproduced exactly
    by the DuckDB oracle."""
    bucket = (
        F.expr(
            f"CAST(conv(substr({md5_seeded_sql('text', 'split')}, 1, 12), 16, 10)"
            " AS BIGINT)"
        )
        % SPLIT_BUCKETS
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < valid_pct, F.lit("valid")).otherwise(F.lit("train")).alias(
            "split"
        ),
    )


def repetition_score(docs: DataFrame, n: int = 3) -> DataFrame:
    """Intra-document repetition: (doc_id, n_shingles, n_distinct, rep_ratio).

    rep_ratio = 1 - distinct/total word-n-grams — the standard boilerplate /
    degenerate-generation signal. One explode + one map-side-combined
    aggregation (count + approx-free exact distinct per doc via a
    two-level group)."""
    sh = shingles(docs, n=n, distinct=False)
    per = sh.groupBy("doc_id", "s").agg(F.count("*").alias("c"))
    out = per.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_shingles"),
        F.count("*").cast("long").alias("n_distinct"),
    )
    return out.select(
        "doc_id",
        "n_shingles",
        "n_distinct",
        F.round(
            F.lit(1.0) - F.col("n_distinct") / F.col("n_shingles"), 6
        ).alias("rep_ratio"),
    )


# ---------------------------------------------------------------------------
# Weighted corpus sampling (language/source mixing)
# ---------------------------------------------------------------------------

SAMPLE_RATES = {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.1}
SAMPLE_DEFAULT_RATE = 0.05


def weighted_sample(
    docs: DataFrame,
    rates: dict[str, float] | None = None,
    by: str = "lang",
    default_rate: float = SAMPLE_DEFAULT_RATE,
) -> DataFrame:
    """Deterministic per-group weighted sampling: (doc_id, group, kept by
    rate[group]).

    The mixing step of a training-data pipeline (up/down-weight languages
    or sources): a doc survives iff its content-hash bucket falls under the
    group's rate. Content-keyed like train_split — duplicates sample
    identically, re-runs are reproducible, and there is no RNG state to
    coordinate across executors. Pure codegen filter; the rate table
    compiles to a CASE expression (a real deployment with thousands of
    sources would broadcast-join a rates dimension instead)."""
    rates = SAMPLE_RATES if rates is None else rates
    bucket = (
        F.expr(
            f"CAST(conv(substr({md5_seeded_sql('text', 'mix')}, 1, 12), 16, 10)"
            " AS BIGINT)"
        )
        % 10000
    )
    rate = F.lit(default_rate)
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(by) == g, F.lit(r)).otherwise(rate)
    return (
        docs.select("doc_id", F.col(by).alias("grp"), bucket.alias("bucket"))
        .filter(F.col("bucket") < rate * 10000)
        .select("doc_id", "grp", "bucket")
    )
