"""Text analysis operators: token stats, quality scoring, language ID,
fingerprinting.

All pure Catalyst array/string expressions (no UDFs): at 100 TB these run
inside whole-stage codegen, shuffle nothing, and read only the ``text``
column from parquet (column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from proteus_spark.functions.texthash import (
    bucket_exprs_sql,
    hex_to_long_spark_sql,
    md5_seeded_sql,
)
from proteus_spark.llmops.dedup import shingles, tokens_col
from proteus_spark.plans.ckpt import release as release_checkpoint

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


TFIDF_TOPN = 3


def tfidf_top_terms(docs: DataFrame, topn: int = TFIDF_TOPN) -> DataFrame:
    """Per-document top-N TF-IDF terms: (doc_id, term, tf, tfidf).

    The per-document counterpart of BM25's corpus search (keyword
    extraction / doc-representation step of a training-data pipeline).
    Scale shape — the classic two-aggregation factorization:

    - term frequencies: one doc-keyed repartition spreads the explode
      across the cluster (raw text crosses that ONE exchange; a
      few-partition source would otherwise serialize the tokenize), then
      groupBy(doc_id, term) with map-side combine — every later exchange
      carries only (doc_id, term) pairs;
    - document frequencies: a second aggregation over the tf relation,
      keyed by term (vocabulary-sized, not corpus-sized); joined back on
      term — an equi-join on the vocabulary, shuffle-partitioned, NOT
      broadcast (a 100 TB corpus has a broadcast-hostile vocabulary);
    - corpus size N: a 1-row broadcast;
    - ranking: row_number per doc_id over that document's DISTINCT terms
      only — bounded by document length, so no single-task global window.

    Smoothed idf = ln((N+1)/(df+1)) + 1 keeps every term finite; the score
    is rounded to 6 decimals BEFORE ranking with a term-name tie-break, so
    top-N membership is engine-stable."""
    sess = docs.sparkSession
    toks = docs.repartition(
        sess.sparkContext.defaultParallelism, "doc_id"
    ).select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = F.broadcast(docs.agg(F.count("*").alias("n")))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(n)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topn)
        .select("doc_id", "term", "tf", "tfidf")
    )


CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_PROBE_TERMS = ("join", "window", "stream", "hash", "table", "zzzznever")


def countmin_estimate(
    docs: DataFrame,
    terms: tuple[str, ...] = CMS_PROBE_TERMS,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """MERGEABLE count-min sketch over the token stream:
    (term, est, exact, ge_exact) for a probe-term set.

    Completes the sketch-rollup family (HLL → distincts, histogram →
    quantiles, CMS → frequencies): per-``source`` partial sketches — a
    (depth × width) grid of counts, ≤ depth·width rows regardless of
    corpus size — merge by plain addition into the corpus sketch, and a
    term's frequency estimate is the MIN of its ``depth`` bucket counts.
    At 100 TB the per-partition partial is KB-sized and the merged
    sketch answers any frequency probe without re-scanning text.

    Everything is integer counts + portable md5 bucket hashes, so a full
    DuckDB oracle checks every row — including the CMS guarantee
    ``est >= exact`` (ge_exact, asserted in the result), which holds
    deterministically, not just probabilistically."""
    sess = docs.sparkSession
    toks = docs.select(
        "source", F.explode(tokens_col()).alias("w")
    )
    bucket_exprs = [
        F.expr(e) for e in bucket_exprs_sql("w", "cms", depth, width)
    ]
    grid = toks.select(
        "source", "w", F.posexplode(F.array(*bucket_exprs)).alias("d", "bucket")
    )
    partial = grid.groupBy("source", "d", "bucket").agg(
        F.count("*").alias("cnt")
    )
    sketch = partial.groupBy("d", "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    probe = sess.createDataFrame([(t,) for t in terms], "term string")
    probe_buckets = probe.select(
        "term",
        F.posexplode(
            F.array(
                *[
                    F.expr(e)
                    for e in bucket_exprs_sql("term", "cms", depth, width)
                ]
            )
        ).alias("d", "bucket"),
    )
    est = (
        probe_buckets.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )
    exact = (
        toks.filter(F.col("w").isin(list(terms)))
        .groupBy(F.col("w").alias("term"))
        .agg(F.count("*").cast("long").alias("exact"))
    )
    out = est.join(exact, "term", "left").select(
        "term",
        "est",
        F.coalesce(F.col("exact"), F.lit(0)).cast("long").alias("exact"),
        (F.col("est") >= F.coalesce(F.col("exact"), F.lit(0)))
        .cast("integer")
        .alias("ge_exact"),
    )
    return out


SAMPLE_K_PER_GROUP = 40


def sample_k_per_group(
    docs: DataFrame, by: str = "lang", k: int = SAMPLE_K_PER_GROUP
) -> DataFrame:
    """Exactly-k deterministic sample per group: (doc_id, grp, rk).

    Eval-set construction: rate-based sampling (weighted_sample) yields
    binomially-sized strata; this yields EXACTLY k docs per group — the k
    with the smallest content hash, so the choice is content-keyed
    (duplicates sample identically, re-runs reproduce, no RNG state).

    Scale shape: rank-per-group plans as WindowGroupLimit — each map-side
    sort keeps only k candidates per group before the exchange, so a
    billion-doc stratum never concentrates in one task's sort buffer. The
    hash is a Catalyst md5 expression (no UDF, one pass)."""
    h = docs.select(
        "doc_id",
        F.col(by).alias("grp"),
        F.expr(md5_seeded_sql("text", "kpg")).alias("_x"),
    ).select(
        "doc_id", "grp", F.expr(hex_to_long_spark_sql("_x")).alias("h")
    )
    w = Window.partitionBy("grp").orderBy("h", "doc_id")
    return (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "grp", F.col("rk").cast("long").alias("rk"))
    )


INDEX_POSTING_CAP = 20  # reference truncates index lookups to 20 records


def inverted_index(docs: DataFrame, cap: int = INDEX_POSTING_CAP) -> DataFrame:
    """Term → capped posting-list materialization: (term, df, postings).

    The text-search member of the reference's index family (§2.5): where
    the reference maintains a B-tree of value→record postings and
    truncates every lookup to 20 records (inMemIndex.go:245-247), this
    materializes term→doc postings with the same cap, generalized behind
    a parameter, as a queryable table.

    Scale shape:

    - one doc-keyed repartition spreads the explode (raw text crosses
      that single exchange), then distinct (doc_id, term) pairs — every
      later exchange carries ids and terms only;
    - the cap is enforced BEFORE any list is collected: row_number per
      term ≤ cap runs as a WindowGroupLimit (rank pushdown), so each
      map-side sort keeps only `cap` candidates per term and a hot term's
      full posting list never sits in one aggregation buffer;
    - document frequency comes from a separate count aggregation over the
      full pair set (the capped subset would under-count), joined back on
      term.

    Postings are the `cap` SMALLEST doc_ids in id order, encoded as a
    comma-joined string so the artifact is engine-portable and hashable
    (a real deployment keeps the array column)."""
    sess = docs.sparkSession
    toks = (
        docs.repartition(sess.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", F.explode(tokens_col()).alias("term"))
        .distinct()
    )
    dfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    posts = (
        toks.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .groupBy("term")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("doc_id"))).alias(
                "postings"
            )
        )
    )
    return dfreq.join(posts, "term").select(
        "term", F.col("df").cast("long").alias("df"), "postings"
    )


# ---------------------------------------------------------------------------
# Deterministic corpus splitting & repetition analysis
# ---------------------------------------------------------------------------

SPLIT_BUCKETS = 100
SPLIT_VALID_PCT = 10  # buckets [0, 10) -> validation, rest -> train


def split_bucket_col() -> "F.Column":
    """The content-hash split bucket in [0, SPLIT_BUCKETS) as a Spark
    Column over a ``text`` column — the single expression both
    ``train_split`` and any split-filtered pipeline (e.g. held-out BPE
    encoding) must share so document↔split assignment can never drift
    between operators."""
    return (
        F.expr(
            f"CAST(conv(substr({md5_seeded_sql('text', 'split')}, 1, 12), 16, 10)"
            " AS BIGINT)"
        )
        % SPLIT_BUCKETS
    )


def train_split(docs: DataFrame, valid_pct: int = SPLIT_VALID_PCT) -> DataFrame:
    """Deterministic train/validation assignment: (doc_id, bucket, split).

    The split key is a content hash (md5 of the text), NOT the doc_id —
    re-ingesting the same corpus with different ids keeps every document in
    its split, and exact duplicates land in the same split (no train/valid
    leakage between copies). Pure codegen expressions; reproduced exactly
    by the DuckDB oracle."""
    bucket = split_bucket_col()
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


# ---------------------------------------------------------------------------
# Chunking, PII scrubbing, sequence packing
# ---------------------------------------------------------------------------

CHUNK_SIZE = 200
CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


def chunk_documents(
    docs: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Fixed-size overlapping character chunks: (doc_id, chunk_id,
    chunk_len, chunk_hash).

    The context-window splitter of a training pipeline: chunk i covers
    [i*stride, i*stride + size) for every start < len(text). Built as a
    per-row sequence + explode + substring — embarrassingly parallel, no
    shuffle, stays in codegen; chunks travel as md5 digests so the wide
    text never rides an exchange."""
    n = F.length("text")
    # greatest-guard: an empty text would make the bound -1, and Spark's
    # sequence(0, -1) counts BACKWARDS instead of yielding nothing
    starts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.floor((n - 1) / stride).cast("long")),
    )
    return (
        docs.select("doc_id", "text", F.explode(starts).alias("chunk_id"))
        .select(
            "doc_id",
            "chunk_id",
            F.substring(
                F.col("text"), (F.col("chunk_id") * stride + 1).cast("int"), size
            ).alias("_c"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.length("_c").cast("long").alias("chunk_len"),
            F.md5("_c").alias("chunk_hash"),
        )
    )


# RE2- and Java-regex compatible (no lookaround): emails + long digit runs
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONGNUM = r"[0-9]{7,}"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII redaction pass: (doc_id, n_emails, n_longnums, scrubbed_hash).

    The compliance scrub of a corpus pipeline: emails -> [EMAIL], 7+-digit
    runs (phone/account-shaped) -> [NUM]; counts via regexp_extract_all so
    the detector and the redactor can't drift apart. Patterns are
    RE2/Java-portable (the DuckDB oracle runs the identical regexes).
    Pure codegen — at 100 TB this is one projection over the text scan."""
    emails = F.regexp_extract_all(F.col("text"), F.lit(PII_EMAIL), F.lit(0))
    nums = F.regexp_extract_all(F.col("text"), F.lit(PII_LONGNUM), F.lit(0))
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", PII_EMAIL, "[EMAIL]"), PII_LONGNUM, "[NUM]"
    )
    return docs.select(
        "doc_id",
        F.size(emails).cast("long").alias("n_emails"),
        F.size(nums).cast("long").alias("n_longnums"),
        F.md5(scrubbed).alias("scrubbed_hash"),
    )


PACK_BUDGET = 512


def pack_sequences(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """Sequence packing: (doc_id, n_tokens, tok_offset, bin_id) — concatenate
    the corpus in doc_id order into one token stream and cut it into
    training sequences of ``budget`` tokens; a document belongs to the bin
    where it starts.

    The global prefix-sum is computed DISTRIBUTED, two-phase: docs fall
    into deterministic doc_id range buckets (one per core), per-bucket
    token totals (one tiny row per bucket) are prefix-summed on the
    driver, then a within-bucket running sum is offset by the bucket's
    prefix — no single-task global window (the naive ``sum() OVER
    (ORDER BY doc_id)`` funnels the whole table through ONE task; this
    form's widest single task is one bucket). Buckets are a pure
    expression of doc_id (not sampled range partitioning), so
    recomputation is deterministic and the lazy plan stays valid."""
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id", F.size(tokens_col()).cast("long").alias("n_tokens")
    )
    par = docs.sparkSession.sparkContext.defaultParallelism
    lo, hi = toks.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    if lo is None:  # empty corpus: nothing to pack
        return toks.select(
            "doc_id", "n_tokens",
            F.lit(0).cast("long").alias("tok_offset"),
            F.lit(0).cast("long").alias("bin_id"),
        )
    width = max(1, (int(hi) - int(lo)) // par + 1)
    bucket = F.floor((F.col("doc_id") - F.lit(int(lo))) / width).cast("int")
    r = toks.withColumn("_pid", bucket)
    # driver-side prefix over <= par rows (bucket id -> token total)
    sums = {
        row["_pid"]: row["s"]
        for row in r.groupBy("_pid").agg(F.sum("n_tokens").alias("s")).collect()
    }
    prefix, acc = {}, 0
    for pid in sorted(sums):
        prefix[pid] = acc
        acc += sums[pid]
    # one parsed expression, not 2*|buckets| F.lit py4j round-trips (r15)
    pmap = F.expr(
        "map(" + ", ".join(
            f"{int(pid)}, CAST({int(prefix[pid])} AS BIGINT)"
            for pid in sorted(prefix)
        ) + ")"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return r.select(
        "doc_id",
        "n_tokens",
        (
            F.element_at(pmap, F.col("_pid"))
            + F.sum("n_tokens").over(w)
            - F.col("n_tokens")
        ).alias("tok_offset"),
    ).withColumn("bin_id", F.floor(F.col("tok_offset") / budget).cast("long"))


def normalize_text(docs: DataFrame) -> DataFrame:
    """Canonicalization pass: (doc_id, norm_hash, n_chars_norm, changed) —
    lowercase, non-alphanumerics to spaces, whitespace collapsed+trimmed.

    The pre-dedup normalization every corpus pipeline runs (near-dup
    detection over raw text misses case/punctuation variants). Normalized
    text ships as a digest; one codegen projection, portable regexes (the
    oracle runs them verbatim)."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_hash"),
        F.length(norm).cast("long").alias("n_chars_norm"),
        (norm != F.col("text")).cast("int").alias("changed"),
    )


# ---------------------------------------------------------------------------
# Gopher-style heuristic quality rules
# ---------------------------------------------------------------------------

# Rule thresholds follow the published Gopher/MassiveText filtering recipe
# (Rae et al. 2021, table A1) — word-count band, mean-word-length band,
# symbol-to-word ratio, alphabetic-word fraction, minimum stopword evidence.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.80
GOPHER_MIN_STOP_HITS = 2


def gopher_filter(docs: DataFrame) -> DataFrame:
    """Gopher-rule document filter: per-doc rule measurements plus the
    composite ``keep`` decision.

    (doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
    n_stop_distinct, keep) — every measure is a pure Catalyst expression
    over the ``text`` column (whole-stage codegen, zero shuffle, column
    pruning to one string column), so at 100 TB this runs at scan speed.
    Thresholds compare the UNROUNDED doubles (int/int division is
    bit-identical across engines); the reported ratio columns are rounded
    to 6 for display stability only."""
    t = tokens_col()
    n_words = F.size(t)
    nw = F.greatest(n_words, F.lit(1))  # defensive: empty text
    sum_len = F.aggregate(F.transform(t, F.length), F.lit(0), lambda a, x: a + x)
    mean_wl = sum_len.cast("double") / nw
    n_hash = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    n_ellipsis = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / 3
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / nw
    n_alpha = F.size(F.filter(t, lambda x: x.rlike("[a-zA-Z]")))
    alpha_ratio = n_alpha.cast("double") / nw
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_stop = F.size(
        F.array_intersect(F.array_distinct(t), F.array(*[F.lit(w) for w in all_stop]))
    )
    keep = (
        (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS)
        & (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN)
        & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
        & (alpha_ratio >= GOPHER_MIN_ALPHA_RATIO)
        & (n_stop >= GOPHER_MIN_STOP_HITS)
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        n_stop.cast("long").alias("n_stop_distinct"),
        keep.cast("int").alias("keep"),
    )


MIXTURE_ALPHA = 0.5  # temperature exponent: 1 = proportional, 0 = uniform


def corpus_mixture(
    docs: DataFrame, by: str = "source", alpha: float = MIXTURE_ALPHA
) -> DataFrame:
    """Temperature-scaled corpus mixing weights: per group,
    (group, n_docs, n_tokens, token_share, weight) with
    weight ∝ token_share^alpha renormalized to sum 1 — the standard
    mixture re-balancing of multilingual/multi-source training recipes
    (alpha<1 up-weights small sources; alpha=1 is proportional sampling).

    One map-side-combined aggregation over the corpus, then the per-group
    normalizations join a BROADCAST one-row totals frame — output rows =
    |groups| (tiny at any corpus scale)."""
    t = tokens_col()
    per = docs.groupBy(F.col(by).alias("grp")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(t)).cast("long").alias("n_tokens"),
    )
    # tot_pow as a sequential fold in group order (not F.sum of doubles):
    # keeps the normalizer bit-identical to the oracle's ordered
    # list_reduce regardless of partition-dependent accumulation order
    totals = per.agg(
        F.sum("n_tokens").cast("long").alias("tot_tokens"),
        F.sort_array(
            F.collect_list(F.struct(F.col("grp"), F.col("n_tokens")))
        ).alias("_arr"),
    ).select(
        "tot_tokens",
        F.aggregate(
            F.transform(
                "_arr",
                lambda x: F.pow(x["n_tokens"].cast("double"), F.lit(alpha)),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("tot_pow"),
    )
    return (
        per.crossJoin(F.broadcast(totals))
        .select(
            "grp",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("tot_tokens"), 6).alias(
                "token_share"
            ),
            F.round(
                F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
                / F.col("tot_pow"),
                6,
            ).alias("weight"),
        )
    )


def unigram_perplexity(docs: DataFrame) -> DataFrame:
    """Unigram-LM perplexity per document: (doc_id, n_tokens, avg_logp,
    ppl) — the CCNet-style quality signal (score each doc under a language
    model; outliers are boilerplate/gibberish). The LM here is the
    corpus's own MLE unigram model, so the operator is self-contained and
    exactly reproducible by the oracle; swapping in an external vocab
    table changes nothing structural.

    Scale shape: one explode + one vocab aggregation (map-side combined);
    token probabilities join back BROADCAST (a unigram vocab is tiny next
    to the corpus — ~millions of rows; were it larger, the same plan runs
    as a shuffle join where the hot-token skew is exactly what AQE's
    skew-join handles). Per-doc reduction is one more map-side-combined
    aggregation. No zero probabilities by construction (every scored
    token is in the vocab), so no smoothing constant to tune."""
    toks = docs.select(
        "doc_id", F.posexplode(tokens_col()).alias("pos", "w")
    )
    vocab = toks.groupBy("w").agg(F.count("*").alias("c"))
    totals = vocab.agg(F.sum("c").alias("n_total"))
    probs = (
        vocab.crossJoin(F.broadcast(totals))
        .select("w", (F.col("c") / F.col("n_total")).alias("p"))
    )
    # Per-doc log-prob sum as a SEQUENTIAL FOLD in token-position order,
    # not F.sum: an unordered double sum accumulates in partition-dependent
    # order while the oracle sums in scan order, and the ~1e-13 wobble can
    # flip round(.,6) at a boundary. Both engines fold the same ordered
    # list left-to-right (the _dot_sql convention), so the doubles are
    # bit-identical. Per-doc lists are bounded by doc length.
    per = (
        toks.join(F.broadcast(probs), "w")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("pos"), F.col("p")))
            ).alias("arr")
        )
    )
    logp_sum = F.aggregate(
        F.transform("arr", lambda x: F.log(x["p"])),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    n = F.size("arr")
    return per.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(logp_sum / n, 6).alias("avg_logp"),
        F.round(F.exp(-logp_sum / n), 6).alias("ppl"),
    )


def bpe_merge_pass(toks: DataFrame, a: str, b: str, col: str = "t") -> DataFrame:
    """One BPE merge application: replace every greedy-leftmost adjacent
    occurrence of (a, b) in each token array with the concatenated symbol
    a||b. Pure Catalyst higher-order fold (F.aggregate) — the carry/emit
    state machine runs JVM-side per row, no shuffle, no UDF; overlapping
    occurrences (only possible when a == b) resolve leftmost-first exactly
    like a sequential BPE trainer."""
    merged = a + b

    def step(s, x):
        acc, carry = s.getField("acc"), s.getField("carry")
        is_merge = carry.isNotNull() & (carry == F.lit(a)) & (x == F.lit(b))
        flushed = F.when(carry.isNull(), acc).otherwise(
            F.array_append(acc, carry)
        )
        return F.when(
            is_merge,
            F.struct(
                F.array_append(acc, F.lit(merged)).alias("acc"),
                F.lit(None).cast("string").alias("carry"),
            ),
        ).otherwise(
            F.struct(flushed.alias("acc"), x.alias("carry"))
        )

    def finish(s):
        acc, carry = s.getField("acc"), s.getField("carry")
        return F.when(carry.isNull(), acc).otherwise(
            F.array_append(acc, carry)
        )

    zero = F.struct(
        F.expr("CAST(array() AS array<string>)").alias("acc"),
        F.lit(None).cast("string").alias("carry"),
    )
    return toks.withColumn(col, F.aggregate(F.col(col), zero, step, finish))


def bpe_adjacent_pairs(toks: DataFrame, col: str = "t") -> DataFrame:
    """(a, b) rows for every ADJACENT token pair — zero-shuffle arrays_zip
    of each array with its own tail (never a self-join)."""
    return toks.select(
        F.explode(
            F.arrays_zip(
                F.slice(col, 1, F.greatest(F.size(col) - 1, F.lit(0))),
                F.expr(f"slice({col}, 2, greatest(size({col}) - 1, 0))"),
            )
        ).alias("p")
    ).select(F.col("p.0").alias("a"), F.col("p.1").alias("b"))


def bpe_train_encode(
    docs: DataFrame, rounds: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Multi-round BPE tokenizer training: iterate count-pairs -> pick the
    top merge (ties lexicographic) -> apply it corpus-wide -> recount, for
    ``rounds`` rounds. Returns ``(rules, encoded)``: the learned merge
    table (rk, a, b, n — rank, merged pair, count WHEN CHOSEN) and the
    ENCODED corpus (doc_id, n_raw, t) — training progressively applies
    every merge, so the final token arrays ARE the corpus encoded under
    the learned tokenizer.

    Scale shape per round: one map-side-combined pair aggregation (the
    only shuffle) feeding a 1-row top-k; the merge application is a
    per-row JVM fold. The driver pull is ONE scalar row per round (the
    chosen merge — the same per-iteration-scalar pattern as the PageRank
    convergence check); the corpus itself never round-trips.
    ``localCheckpoint`` after each merge truncates lineage so the plan
    does not nest ``rounds`` fold expressions deep (the PageRank /
    dup_components fixpoint pattern). Each round costs exactly ONE job
    (optimization r15): the merge checkpoint is LAZY and is materialized
    by the next round's pair-count aggregation itself — previously every
    round paid a second, separate eager-checkpoint job — and the
    superseded generation's blocks are released deterministically once
    its child is materialized (the pq_train release discipline)."""
    spark = docs.sparkSession
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all("text", F.lit(BPE_REGEX), F.lit(0)).alias("t"),
    ).withColumn("n_raw", F.size("t"))
    rules: list[tuple[int, str, str, int]] = []
    prev = None  # superseded checkpoint generation, dead once toks is live
    # try/finally (ADVICE r15): a mid-loop exception must not strand the
    # superseded or in-flight generations; only the successfully returned
    # toks stays pinned.
    ok = False
    try:
        for r in range(rounds):
            best = (
                bpe_adjacent_pairs(toks)
                .groupBy("a", "b")
                .agg(F.count("*").cast("long").alias("n"))
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            # the collect above materialized toks' lazy checkpoint, so the
            # generation toks was derived from is now dead
            release_checkpoint(prev)
            prev = toks if r else None  # round 0's toks is the raw projection
            if not best:
                break  # no doc has two adjacent tokens left
            a, b, n = best[0]["a"], best[0]["b"], best[0]["n"]
            rules.append((r + 1, a, b, n))
            toks = bpe_merge_pass(toks, a, b).localCheckpoint(eager=False)
        ok = True
    finally:
        if not ok:  # exception path: nothing is returned, free everything
            if prev is not toks:
                release_checkpoint(prev)
            release_checkpoint(toks)
    rules_df = spark.createDataFrame(
        rules, "rk long, a string, b string, n long"
    )
    return rules_df, toks


def bpe_train(docs: DataFrame, rounds: int = 8) -> DataFrame:
    """The merge table alone — see ``bpe_train_encode``."""
    return bpe_train_encode(docs, rounds)[0]


def bpe_encode(docs: DataFrame, rules: list[tuple[int, str, str]]) -> DataFrame:
    """ENCODE a corpus under an already-learned merge table — the
    tokenizer's apply path (train once, encode any split/stream forever).

    ``rules`` is the (rank, a, b) merge list in training order; each rule
    is applied greedy-leftmost via the same JVM higher-order fold training
    uses (``bpe_merge_pass``), so train-split and held-out encodings are
    byte-identical in semantics. The whole application is ONE narrow
    stage: a scan feeding |rules| nested fold expressions — no shuffle per
    rule, no UDF, nothing to the driver (the rule list itself is O(rounds)
    literals baked into the plan). Returns (doc_id, n_raw, t)."""
    toks = docs.select(
        "doc_id",
        F.regexp_extract_all("text", F.lit(BPE_REGEX), F.lit(0)).alias("t"),
    ).withColumn("n_raw", F.size("t"))
    for _rk, a, b in sorted(rules):
        toks = bpe_merge_pass(toks, a, b)
    return toks


# Quality-classifier hyperparameters: fixed full-batch GD rounds (no
# data-dependent stop — the quantized-iteration determinism rule) and
# fixed feature centering/scale constants (no data-dependent
# standardization: a corpus-mean z-score would make every feature depend
# on global fp-summation order).
QUALITY_LR_ROUNDS = 8


def quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, f0..f5, y): the classifier's design matrix over the
    gopher_filter measurements — fixed affine centering per feature
    (constants chosen from the documented metric ranges, NOT computed
    from the data), every value rounded to 6 before use so both engines
    train on identical inputs. y = the Gopher keep decision (the
    heuristic label the classifier distills into a smooth score)."""
    g = gopher_filter(docs)
    return g.select(
        "doc_id",
        F.lit(1.0).alias("f0"),
        F.round((F.col("n_words").cast("double") - 50.0) / 25.0, 6).alias("f1"),
        F.round((F.col("mean_word_len") - 4.5) * 2.0, 6).alias("f2"),
        F.round(F.col("symbol_ratio") * 10.0, 6).alias("f3"),
        F.round((F.col("alpha_word_ratio") - 0.5) * 2.0, 6).alias("f4"),
        F.round(F.col("n_stop_distinct").cast("double") - 1.5, 6).alias("f5"),
        F.col("keep").cast("double").alias("y"),
    )


def _logit(weights: list[float]):
    """Left-associated dot(w, f) — the association order is part of the
    cross-engine contract (the SQL oracle writes the same chain)."""
    z = F.lit(weights[0]) * F.col("f0")
    for j in range(1, 6):
        z = z + F.lit(weights[j]) * F.col(f"f{j}")
    return z


def train_quality_classifier(
    feats: DataFrame, rounds: int = QUALITY_LR_ROUNDS
) -> tuple[list[float], DataFrame]:
    """Distributed logistic-regression training of a document-quality
    classifier (the fastText/FineWeb-style pipeline step: distill a
    labeled heuristic into a smooth scorer you can threshold at a chosen
    precision). Full-batch gradient descent, ``rounds`` fixed rounds,
    lr = 1.

    Determinism (the kmeans_train playbook, VERDICT r6 #4): predictions
    quantize to round-6 before use; each row's per-feature gradient
    contribution quantizes to INTEGER MICROS and aggregates as an exact
    BIGINT sum (shuffle/partial-agg order cannot perturb it — the PQ ADC
    trick); the weight update rounds to 6 inside the engine (never
    driver-side Python rounding, whose banker's-rounding ties differ
    from SQL's half-away-from-zero). A SQL oracle replays training
    bit-for-bit as one static unroll.

    Scale: each round is ONE whole-stage-codegen scan of the (cached)
    feature frame + a 6-value exact partial aggregation; the driver
    pulls 6 scalars per round (bounded state). Returns
    (weights, scored) where scored = (doc_id, score, pred, label)."""
    feats = feats.localCheckpoint(eager=True)
    nd = float(feats.count())
    w = [0.0] * 6
    for _ in range(rounds):
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit(w))), 6)
        aggs = [
            F.round(
                F.lit(w[j])
                - (
                    F.sum(
                        F.round(
                            (p - F.col("y")) * F.col(f"f{j}") * F.lit(1e6)
                        ).cast("long")
                    ).cast("double")
                    / F.lit(1e6)
                )
                / F.lit(nd),
                6,
            ).alias(f"w{j}")
            for j in range(6)
        ]
        row = feats.agg(*aggs).collect()[0]
        w = [row[f"w{j}"] for j in range(6)]
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit(w))), 6)
    scored = feats.select(
        "doc_id",
        score.alias("score"),
        (score >= 0.5).cast("int").alias("pred"),
        F.col("y").cast("int").alias("label"),
    )
    return w, scored


def quality_score_against(batch: DataFrame, weights: list[float]) -> DataFrame:
    """Score ARRIVING documents with a FROZEN quality classifier — the
    live-intake half of train_quality_classifier (the fastText/FineWeb
    deployment shape: distill the heuristic into a scorer ONCE on the
    lake, then gate the crawl with it). ``weights`` are the 6 round-6
    floats the trainer returns; scoring is a pure Catalyst projection
    over quality_features (whole-stage codegen, ZERO shuffle — the model
    is six literals, there is no model join at all), so at 100 TB this
    runs at scan speed inside the ingest pipeline.

    (doc_id, score, kept): kept = score >= 0.5, the trainer's own
    decision rule, landing with the document BEFORE it enters the lake.
    Per-document independence makes stream == batch exact
    (test_quality_gate_on_ingest_converges_to_batch)."""
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit(weights))), 6)
    return quality_features(batch).select(
        "doc_id",
        score.alias("score"),
        (score >= 0.5).cast("int").alias("kept"),
    )


# ---------------------------------------------------------------------------
# DSIR: Data Selection via Importance Resampling (Xie et al., 2023)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 4096
DSIR_TARGET_LANG = "en"
DSIR_SELECT_K = 50
_DSIR_U_DENOM = (1 << 48) + 2  # hash48 + 1 over this -> u strictly in (0,1)


def _dsir_bigram_buckets(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, is_t, b): hashed word-bigram occurrences WITH multiplicity
    (DSIR's bag-of-hashed-ngrams features) plus the target-membership
    flag. Same array-transform construction as dedup.shingles (zero UDFs,
    whole-stage codegen); the 48-bit md5 bucket hash is the portable
    family both engines replay (functions/texthash.py)."""
    t = tokens_col()
    base = docs.select(
        "doc_id",
        (F.col("lang") == DSIR_TARGET_LANG).cast("long").alias("is_t"),
        t.alias("_t"),
    )
    size = F.size(F.col("_t"))
    idx = F.sequence(F.lit(0), size - 2)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.get(F.col("_t"), i), F.get(F.col("_t"), i + 1)
        ),
    )
    arr = F.when(size >= 2, grams).otherwise(F.array().cast("array<string>"))
    bg = base.select("doc_id", "is_t", F.explode(arr).alias("s"))
    seeded = md5_seeded_sql("s", "dsir")
    bucket = F.expr(f"{hex_to_long_spark_sql(f'({seeded})')} % {n_buckets}")
    return bg.select("doc_id", "is_t", bucket.alias("b"))


def dsir_model(docs: DataFrame, n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Train (freeze) the DSIR importance model on a corpus: the
    per-bucket log-ratio frame (b, lr_micros), <= n_buckets rows —
    broadcast-sized at any corpus scale. Separated from selection so a
    live intake can score ARRIVING documents against a frozen model
    (dsir_score_against) without re-reading the training corpus."""
    bb = _dsir_bigram_buckets(docs, n_buckets)
    counts = bb.groupBy("b").agg(
        F.count("*").cast("long").alias("cr"),
        F.sum("is_t").cast("long").alias("ct"),
    )
    tot = bb.agg(
        F.count("*").cast("long").alias("nr"),
        F.sum("is_t").cast("long").alias("nt"),
    )
    # identical formula text on both engines: one ln, doubles throughout
    return counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.expr(
            f"CAST(round(ln((CAST(ct + 1 AS DOUBLE) * CAST(nr + {n_buckets} AS DOUBLE))"
            f" / (CAST(cr + 1 AS DOUBLE) * CAST(nt + {n_buckets} AS DOUBLE)))"
            " * 1e6, 0) AS BIGINT)"
        ).alias("lr_micros"),
    )


def dsir_score_against(
    docs: DataFrame, model: DataFrame, n_buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """Score documents against a (frozen) DSIR model: (doc_id,
    llr_micros, n_bigrams). One linear pass — bigram-bucket explode,
    BROADCAST join to the <= n_buckets-row model, one groupBy doc_id.
    This is the on-ingest shape: a live intake scores each arriving
    micro-batch against the model trained on the existing lake and
    keeps/drops before the document ever lands."""
    bb = _dsir_bigram_buckets(docs, n_buckets)
    return (
        bb.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("lr_micros").cast("long").alias("llr_micros"),
            F.count("*").cast("long").alias("n_bigrams"),
        )
    )


def dsir_select(
    docs: DataFrame,
    k: int = DSIR_SELECT_K,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR data selection: importance-resample ``k`` documents toward a
    target distribution (here the deterministic ``lang='en'`` slice)
    using hashed-bigram bag-of-words importance weights — the method of
    "Data Selection via Importance Resampling" (Xie et al., 2023),
    deterministic edition.

    Per bucket b over B hashed bigram buckets, with target counts ct /
    raw counts cr and totals nt / nr, the add-one-smoothed log ratio
    lr(b) = ln( ((ct+1)/(nt+B)) / ((cr+1)/(nr+B)) ) is quantized to
    INTEGER MICROS (the cross-engine determinism recipe: per-term round
    once, sum as BIGINT). A document's importance llr = sum of its
    bigrams' lr_micros. Selection is Gumbel-top-k — g = llr/1e6 +
    Gumbel(u) with u drawn from the portable 48-bit md5 hash of the
    doc_id, so the "randomness" is deterministic and the DuckDB oracle
    replays the SAME sample — which is exactly sampling k docs without
    replacement with probability proportional to softmax(llr), the
    paper's resampling step.

    Scale shape (100 TB): the feature pass is one map-side-combined
    groupBy over <= B buckets (tiny), totals are one scalar row, the
    per-bucket log-ratio frame (<= B rows) BROADCASTS into the scoring
    join, one groupBy doc_id, and the final selection is a top-k
    (TakeOrderedAndProject) — two linear passes over the corpus, no
    wide shuffle beyond the doc_id aggregation, nothing quadratic.

    Output: (doc_id, lang, n_bigrams, llr_micros, gumbel_key), the k
    selected docs, gumbel_key descending."""
    lr = dsir_model(docs, n_buckets)
    scored = dsir_score_against(docs, lr)
    u_hash = hex_to_long_spark_sql(
        "(md5('dsirg|' || CAST(doc_id AS STRING)))"
    )
    # gumbel_key MUST derive from the COALESCED llr (docs with <2 tokens
    # have no bigrams → NULL from the left join; the oracle coalesces to
    # 0 inside the formula, so build from the coalesced column or short
    # docs sort last and can never be sampled).
    gumbel = F.expr(
        f"round(CAST(llr_micros AS DOUBLE) / CAST(1000000 AS DOUBLE)"
        f" - ln(-ln((CAST({u_hash} AS DOUBLE) + CAST(1 AS DOUBLE))"
        f" / CAST({_DSIR_U_DENOM} AS DOUBLE))), 6)"
    )
    return (
        docs.select("doc_id", "lang")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("llr_micros", F.lit(0)).cast("long").alias("llr_micros"),
        )
        .select(
            "doc_id",
            "lang",
            "n_bigrams",
            "llr_micros",
            gumbel.alias("gumbel_key"),
        )
        .orderBy(F.desc("gumbel_key"), "doc_id")
        .limit(k)
    )
