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
