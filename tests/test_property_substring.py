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
