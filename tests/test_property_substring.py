"""Property test: the exact-substring span-dedup query agrees with a
pure-Python model on randomized corpora.

The oracle gate pins the query against DuckDB on the fixed testdata; this
test drives the SAME registered code path over hypothesis-generated
corpora (tiny vocabulary => dense genuine window collisions, doc lengths
straddling the window size, empty docs) and checks an independent Python
implementation of the W/S window semantics.
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from proteus_spark import registry

registry._import_all()

W, S = 20, 10  # must match queries.llm.SUBSTR_W / SUBSTR_S

# two-word vocabulary: 20-token windows collide across docs often enough
# that every run exercises real duplicate spans
doc_strategy = st.lists(
    st.lists(st.sampled_from(["alpha", "beta"]), min_size=0, max_size=35),
    min_size=3,
    max_size=25,
)


def _model(docs: list[list[str]]):
    wins: dict[int, list[str]] = {}
    for i, toks in enumerate(docs):
        ws = []
        if len(toks) >= W:
            for s in range(0, len(toks) - W + 1, S):
                ws.append(" ".join(toks[s : s + W]))
        wins[i] = ws
    owners: dict[str, set[int]] = {}
    for i, ws in wins.items():
        for w in ws:
            owners.setdefault(w, set()).add(i)
    out = {}
    for i, ws in wins.items():
        dup = sum(1 for w in ws if len(owners[w]) >= 2)
        out[i] = (len(ws), dup, round(dup / max(len(ws), 1), 6))
    return out


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("prop_corpus")


@given(docs=doc_strategy)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_substring_matches_python_model(spark, corpus_dir, docs):
    d = os.path.join(str(corpus_dir), "case")
    spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
        for r in registry.QUERIES["llm_dedup_exact_substring"]
        .fn(spark, d)
        .collect()
    }
    assert got == _model(docs)


def test_bpe_merge_pass_matches_greedy_model(spark):
    """bpe_merge_pass (the Catalyst carry/emit fold) vs an independent
    Python model of greedy-leftmost non-overlapping merge, over seeded
    random token sequences from a tiny alphabet — including the a == b
    overlap regime ('x x x x' -> 'xx xx') and runs longer than any
    window the fold sees at once. One Spark action per merge pair."""
    import random

    from pyspark.sql import functions as F

    from proteus_spark.llmops.text import bpe_merge_pass

    def model(toks, a, b):
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        return out

    rnd = random.Random(13)
    alphabet = ["x", "y", "z"]
    seqs = [
        [rnd.choice(alphabet) for _ in range(rnd.randint(0, 12))]
        for _ in range(300)
    ]
    seqs += [["x"] * n for n in range(1, 8)]  # pure-run overlap ladders
    for a, b in [("x", "y"), ("x", "x"), ("y", "z"), ("z", "z")]:
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(seqs)], "i long, t array<string>"
        )
        got = {
            r["i"]: list(r["t"])
            for r in bpe_merge_pass(df, a, b).collect()
        }
        exp = {i: model(s, a, b) for i, s in enumerate(seqs)}
        assert got == exp


def test_bpe_encode_reproduces_training_encoding(spark):
    """The apply path (bpe_encode: learned rules replayed in rank order)
    must reproduce training's own final token arrays when pointed back at
    the training corpus — train-then-encode == train_encode. This pins
    the holdout query's rule application to training's merge semantics."""
    from pyspark.sql import functions as F

    from proteus_spark.llmops.text import bpe_encode, bpe_train_encode

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the the the aa aa b"),
            (3, "a a a a"),
            (4, ""),
            (5, "cat cat mat mat the"),
        ],
        "doc_id long, text string",
    )
    rules_df, trained = bpe_train_encode(docs, rounds=5)
    rules = [(r["rk"], r["a"], r["b"]) for r in rules_df.collect()]
    encoded = bpe_encode(docs, rules)
    got = {r["doc_id"]: list(r["t"]) for r in encoded.collect()}
    want = {r["doc_id"]: list(r["t"]) for r in trained.collect()}
    assert got == want
    raw = {r["doc_id"]: r["n_raw"] for r in encoded.collect()}
    n_toks = {
        r["doc_id"]: len(
            [t for t in (r["text"] or "").split() for _ in [0]]
        )
        for r in docs.collect()
    }
    # n_raw counts pre-merge tokens (regex tokens; whitespace words here
    # lower-bound it since the BPE regex also splits punctuation)
    assert all(raw[d] >= n_toks[d] for d in raw)
