"""Empty-input robustness: a production pipeline routinely sees empty
partitions/dates — a schema-only input must yield an empty result (or,
for training ops where an empty corpus is an upstream bug, a CLEAR
ValueError), never a cryptic NoneType/ZeroDivision crash.

A full-registry sweep at round 4 found exactly 5 crashers out of ~130
batch queries; this module pins those fixes plus a representative core
sample so regressions surface immediately.
"""

from __future__ import annotations

import os

import pytest

from proteus_spark import TABLES, registry

registry._import_all()


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            spark.read.parquet(src).limit(0).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(d / f"{t}.parquet"))
    return str(d)


# the round-4 crashers that now return gracefully, plus core-family reps
GRACEFUL = [
    "ref_index_zorder",     # was: schema inference failure on empty index
    "agg_hll_rollup",       # was: ZeroDivision in the in-query bound
    "llm_pack_sequences",   # was: int(None) in the prefix-sum seed
    "ref_point_eq",
    "tpch_q1",
    "llm_dedup_exact_substring",
    "llm_token_budget_sample",
    "events_ab_lift",
    "graph_pagerank_parts",
    # round-5 additions (verified empty-clean when they landed)
    "graph_pagerank_converged",
    "llm_knn_classify",
    "llm_embed_class_margins",
    "llm_sim_mips_banded",
    "llm_sim_mips_recall",
]


@pytest.mark.parametrize("name", GRACEFUL)
def test_empty_input_yields_empty_result(spark, empty_dir, name):
    df = registry.QUERIES[name].fn(spark, empty_dir)
    assert df.limit(5).count() == 0


@pytest.mark.parametrize("name", ["llm_sim_pq", "llm_sim_ivf_kmeans"])
def test_training_ops_raise_clear_error_on_empty_corpus(spark, empty_dir, name):
    """Quantizer training over an empty corpus is an upstream pipeline bug:
    surface a clear ValueError, not a NoneType subscript / Py4J fit error."""
    with pytest.raises(ValueError, match="empty corpus"):
        registry.QUERIES[name].fn(spark, empty_dir)


def test_dsir_select_short_docs_remain_samplable(spark, tmp_path_factory):
    """Regression (round-10 advice): documents with <2 tokens have no
    bigrams, so the left join to the scored frame yields NULL llr_micros.
    The gumbel_key MUST be built from coalesce(llr_micros, 0) — exactly
    as the DuckDB oracle does — or short/empty docs get a NULL key, sort
    last in Spark, and can never be sampled while the oracle samples
    them. Corpus of 20 docs (< k=50) so every doc is selected and any
    NULL key is a guaranteed value mismatch."""
    from tests.oracle_utils import compare, duckdb_conn

    d = tmp_path_factory.mktemp("sf_shortdocs")
    rows = [
        (1, "", "en", "synth", 0),                      # 0 tokens
        (2, "hello", "en", "synth", 5),                 # 1 token
        (3, "x", "fr", "synth", 1),                     # 1 token, non-target
        (4, "", "fr", "synth", 0),                      # empty, non-target
    ] + [
        (i, f"common words doc {i} tail token", "en" if i % 2 else "fr",
         "synth", 30)
        for i in range(5, 21)
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*rows))
    pq.write_table(  # one plain file so DuckDB's read_parquet sees it too
        pa.table(
            {
                "doc_id": pa.array(cols[0], pa.int64()),
                "text": pa.array(cols[1], pa.string()),
                "lang": pa.array(cols[2], pa.string()),
                "source": pa.array(cols[3], pa.string()),
                "n_chars": pa.array(cols[4], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )

    spec = registry.QUERIES["llm_dsir_select"]
    df = spec.fn(spark, str(d))
    out = {r["doc_id"]: r for r in df.collect()}
    assert len(out) == 20, "all 20 docs must be selected at k=50"
    for did in (1, 2, 3, 4):
        assert out[did]["gumbel_key"] is not None, (
            f"short doc {did} got a NULL gumbel_key — build the key from "
            "the coalesced llr_micros"
        )
        assert out[did]["llr_micros"] == 0 and out[did]["n_bigrams"] == 0

    con = duckdb_conn(str(d))
    try:
        problems = compare(df, con, spec.resolve_oracle())
    finally:
        con.close()
    assert not problems, problems


def test_lsh_match_includes_unshingleable_docs(spark):
    """The on-ingest near-dup gate must surface EVERY arriving document:
    docs too short to shingle (<3 tokens) produce no bands — they must
    land with n_lake_candidates = 0 like any non-duplicate, never be
    silently dropped from the gated output (the sink IS the intake
    record; a dropped row is a lost document)."""
    from proteus_spark.llmops.dedup import (
        lsh_band_table,
        lsh_match_against,
        minhash_signatures,
        shingles,
    )

    lake = spark.createDataFrame(
        [(100, "a b c d e f g h")], "doc_id bigint, text string"
    )
    lake_bands = lsh_band_table(
        minhash_signatures(shingles(lake, distinct=False))
    ).withColumnRenamed("doc_id", "lake_id")
    batch = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),  # identical to the lake doc
            (2, "xy"),               # 1 token: unshingleable
            (3, ""),                 # empty
            (4, "totally different words entirely here now"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["n_lake_candidates"], r["is_dup"])
        for r in lsh_match_against(batch, lake_bands).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1] == (1, 1)  # identical text: all bands match
    assert out[2] == (0, 0) and out[3] == (0, 0) and out[4] == (0, 0)


def test_empty_lakes_read_back_and_gate_everything_through(spark, tmp_path):
    """Review r13 #4: a ZERO-ROW maintained lake (fresh deployment, or a
    slice where nothing was indexable) writes no part files — the
    partitioned-lake readers must replay the writer's schema sidecar and
    gate every arriving doc as a non-duplicate, not fail parquet schema
    inference where the cached-DataFrame path would have returned 0s."""
    from proteus_spark.llmops.dedup import (
        lsh_band_table,
        lsh_lake_write,
        lsh_match_against_bucketed,
        minhash_signatures,
        shingles,
    )
    from proteus_spark.llmops.lake import lake_read

    empty_lake = spark.createDataFrame([], "doc_id bigint, text string")
    lakedir = str(tmp_path / "lsh_lake")
    lsh_lake_write(
        lsh_band_table(
            minhash_signatures(shingles(empty_lake, distinct=False))
        ).withColumnRenamed("doc_id", "lake_id"),
        lakedir,
    )
    lake_bands = lake_read(spark, lakedir)
    assert lake_bands.count() == 0
    assert {"lake_id", "band", "bv", "bk"} <= set(lake_bands.columns)
    batch = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "xy")], "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: (r["n_lake_candidates"], r["is_dup"])
        for r in lsh_match_against_bucketed(batch, lake_bands).collect()
    }
    assert out == {1: (0, 0), 2: (0, 0)}

    # the semantic twin: empty embedding lake
    from pyspark.sql import functions as F

    from proteus_spark.llmops.similarity import (
        semdedup_lake_index,
        semdedup_lake_write,
        semdedup_match_against_bucketed,
    )

    emb_schema = "vec_id bigint, embedding array<float>"
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], emb_schema
    )
    empty_emb = spark.createDataFrame([], emb_schema)
    semdir = str(tmp_path / "sem_lake")
    semdedup_lake_write(semdedup_lake_index(empty_emb, centroids), semdir)
    lake_idx = lake_read(spark, semdir)
    assert lake_idx.count() == 0
    arriving = spark.createDataFrame([(7, [1.0, 0.0])], emb_schema)
    rows = semdedup_match_against_bucketed(
        arriving, lake_idx, centroids
    ).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["vec_id"] == 7 and r["n_lake_near"] == 0 and r["is_dup"] == 0


def test_minhash_band_table_matches_pure_python_reference(spark):
    """Independent pin of the MinHash/LSH chain against a pure-Python
    reference built straight from the spec (hashlib.md5, positional hex
    expansion, h_i = (y0 + i*y1) mod P, per-band comma-joined values) —
    engine-vs-oracle agreement alone can't catch a bug both engines
    share; this can. Randomized corpus, fixed seed."""
    import hashlib
    import random

    from proteus_spark.llmops.dedup import (
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_K,
        MINHASH_PRIME,
        SHINGLE_N,
        lsh_band_table,
        minhash_signatures,
        shingles,
    )

    rng = random.Random(0)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
        for i in range(50)
    ]

    def py_bands(text: str) -> list[tuple[int, str]]:
        toks = text.split(" ")
        grams = [
            " ".join(toks[j : j + SHINGLE_N])
            for j in range(len(toks) - SHINGLE_N + 1)
        ]
        mins = [None] * MINHASH_K
        for s in grams:
            hx = hashlib.md5(f"0|{s}".encode()).hexdigest()
            y0, y1 = int(hx[0:12], 16), int(hx[12:24], 16)
            for i in range(MINHASH_K):
                h = (y0 + i * y1) % MINHASH_PRIME
                if mins[i] is None or h < mins[i]:
                    mins[i] = h
        return [
            (
                b,
                ",".join(
                    str(mins[b * LSH_ROWS + r]) for r in range(LSH_ROWS)
                ),
            )
            for b in range(LSH_BANDS)
        ]

    want = {
        (doc_id, b, bv)
        for doc_id, text in rows
        for b, bv in py_bands(text)
    }
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["band"], r["bv"])
        for r in lsh_band_table(
            minhash_signatures(shingles(df, distinct=False))
        ).collect()
    }
    assert got == want


def test_simhash_signatures_match_pure_python_reference(spark):
    """Same independent spec pin for SimHash: bit b of the signature is
    the majority vote of bit b across the DISTINCT-token md5 hashes
    (seed 'sim', first 12 hex chars as a 48-bit value). Randomized
    corpus, fixed seed."""
    import hashlib
    import random

    from proteus_spark.llmops.dedup import SIMHASH_BITS, simhash_signatures

    rng = random.Random(1)
    vocab = ["red", "green", "blue", "cyan", "teal", "plum", "gold", "gray"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15))))
        for i in range(50)
    ]

    def py_simhash(text: str) -> int:
        votes = [0] * SIMHASH_BITS
        for w in set(text.split(" ")):
            h = int(
                hashlib.md5(f"sim|{w}".encode()).hexdigest()[:12], 16
            )
            for b in range(SIMHASH_BITS):
                votes[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(SIMHASH_BITS) if votes[b] > 0)

    want = {(doc_id, py_simhash(text)) for doc_id, text in rows}
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["simhash"])
        for r in simhash_signatures(df).collect()
    }
    assert got == want


def test_hll_estimate_matches_pure_python_reference(spark, sf_dir):
    """The md5-register HLL is a SHARED-SQL query — both engines execute
    the same text, so the oracle cannot catch a spec bug in that text.
    This pin recomputes the whole sketch in pure Python (hashlib md5,
    integer harmonic sum in units of 2^-49, linear-counting branch,
    half-up rounding) from the parquet and requires exact equality.
    Repointed at agg_hll_rollup after agg_approx_distinct's r11
    retirement (same template, superset instantiation) and EXTENDED to
    the register-wise-max union: both the per-month estimates and the
    merged total must match the pure-Python sketch exactly."""
    import hashlib
    import math

    import pyarrow.parquet as pq

    from proteus_spark import registry

    m = 1024
    alpha = 0.7213 / (1 + 1.079 / m)
    num = alpha * m * m * float(2**49)

    def estimate(mx_values):
        cnt = len(mx_values)
        ssc = sum(2 ** (49 - x) for x in mx_values) + (m - cnt) * 2**49
        raw = num / float(ssc)
        if (m - cnt) > 0 and raw <= 2.5 * m:
            raw = m * math.log(m / (m - cnt))
        return math.floor(raw * 10000 + 0.5) / 10000  # SQL HALF_UP

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_shipdate", "l_orderkey"]
    )
    regs: dict[tuple[str, int], int] = {}
    for d, val in zip(
        t.column("l_shipdate").to_pylist(), t.column("l_orderkey").to_pylist()
    ):
        grp = str(d)[:7]  # substr(CAST(l_shipdate AS STRING), 1, 7)
        h = hashlib.md5(f"hll|{val}".encode()).hexdigest()
        reg = int(h[0:3], 16) % m
        rest = h[3:15].lstrip("0")
        if rest == "":
            rho = 49
        else:
            nib = rest[0]
            lead = 0 if nib in "89abcdef" else 1 if nib in "4567" else \
                2 if nib in "23" else 3
            rho = (12 - len(rest)) * 4 + lead + 1
        k = (grp, reg)
        if rho > regs.get(k, 0):
            regs[k] = rho

    groups = {g for g, _ in regs}
    want = {
        g: estimate([v for (gg, _), v in regs.items() if gg == g])
        for g in sorted(groups)
    }
    union: dict[int, int] = {}
    for (_, reg), v in regs.items():
        if v > union.get(reg, 0):
            union[reg] = v
    want_merged = estimate(list(union.values()))

    rows = registry.QUERIES["agg_hll_rollup"].fn(spark, sf_dir).collect()
    got = {r["month"]: r["month_estimate"] for r in rows}
    assert got == want
    assert {r["merged_estimate"] for r in rows} == {want_merged}


def test_bucket_hash_family_matches_pure_python_reference(spark):
    """The k-function md5 bucket family feeding the count-min and Bloom
    sketches (functions/texthash.py::bucket_exprs_sql) — pure-Python
    recomputation over sample values, exact equality."""
    import hashlib

    from pyspark.sql import functions as F

    from proteus_spark.functions.texthash import bucket_exprs_sql

    k, mod = 4, 512
    words = ["alpha", "beta", "", "x", "the quick brown fox", "123"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    exprs = [F.expr(e).alias(f"b{i}") for i, e in
             enumerate(bucket_exprs_sql("w", "cms", k, mod))]
    got = {
        r["w"]: tuple(r[f"b{i}"] for i in range(k))
        for r in df.select("w", *exprs).collect()
    }
    want = {
        w: tuple(
            int(hashlib.md5(f"cms{d}|{w}".encode()).hexdigest()[:12], 16)
            % mod
            for d in range(k)
        )
        for w in words
    }
    assert got == want


def test_srp_banding_matches_pure_python_reference(spark, sf_dir):
    """Spec pin for the SRP embedding banding (the ANN counterpart of
    the text-hash pins): bit m of band j is sign(v[j*r + m] >= 0), band
    value = little-endian bit pack — recomputed in pure Python over the
    real embeddings parquet, full band-table equality."""
    import pyarrow.parquet as pq

    from proteus_spark.llmops.similarity import (
        SRP_BANDS,
        SRP_BITS,
        srp_banded,
    )

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    r = SRP_BITS // SRP_BANDS
    want = set()
    for vid, vec in zip(
        t.column("vec_id").to_pylist(), t.column("embedding").to_pylist()
    ):
        for j in range(SRP_BANDS):
            bval = sum(
                (1 << m) for m in range(r) if vec[j * r + m] >= 0
            )
            want.add((vid, j, bval))
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    got = {
        (row["vid"], row["band"], row["bval"])
        for row in srp_banded(df, "vec_id", "vid").collect()
    }
    assert got == want


def test_schema_sidecar_write_is_atomic_and_corrupt_sidecar_falls_back(
    spark, tmp_path
):
    """ADVICE r13: the sidecar commits via tmp-file + os.replace (the
    minilog marker pattern) — no .tmp residue, never a truncated file —
    and a sidecar that fails to parse (crash under the pre-atomic layout,
    manual damage) must fall back to inference for a non-empty lake
    instead of crashing the reader."""
    import os

    from proteus_spark.llmops.lake import (
        _SCHEMA_SIDECAR,
        lake_read,
        write_schema_sidecar,
    )

    lakedir = str(tmp_path / "lake")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id bigint, text string")
    df.write.mode("overwrite").parquet(lakedir)
    write_schema_sidecar(df, lakedir)
    # atomic: the final name exists, the temp name does not
    assert os.path.exists(os.path.join(lakedir, _SCHEMA_SIDECAR))
    assert not os.path.exists(os.path.join(lakedir, _SCHEMA_SIDECAR + ".tmp"))
    assert lake_read(spark, lakedir).count() == 2

    # truncated sidecar (the mid-write crash a reader could race into
    # under the old non-atomic write): reader falls back to inference
    with open(os.path.join(lakedir, _SCHEMA_SIDECAR), "w") as fh:
        fh.write('{"type": "struct", "fiel')
    out = lake_read(spark, lakedir)
    assert out.count() == 2
    assert set(out.columns) == {"doc_id", "text"}
