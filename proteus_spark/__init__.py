"""proteus_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dvasilas/proteus.

The reference system (https://github.com/dvasilas/proteus) assembles a query
processor as a DAG of single-operator microservices ("QPUs") — scan,
group-by-sum, keyed-merge join, secondary index, cache, router — each a
continuously-maintained materialized view fed by a snapshot+subscribe CDC
stream (reference: internal/qpu.go:33-75, Documentation.md:10-16).

This engine re-expresses those capabilities Spark-first:

- ad-hoc query plane  -> ``engine.Engine.query(sql)`` over registered views
  (reference: internal/apiprocessor/apiprocessor.go:218-245)
- view-maintenance plane -> ``streaming.views`` Structured-Streaming
  materialized views with catch-up gates and subscriptions
  (reference: internal/qpu_classes/sum/sum.go:90-103, join/join.go:111-143)
- operators -> thin, composable DataFrame transforms in ``operators/``
- beyond-reference LLM-data-pipeline operators in ``llmops/``
  (dedup, similarity search, text analysis, multimodal columns)

Everything here is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

from proteus_spark.session import build_session  # noqa: E402,F401
from proteus_spark.engine import Engine  # noqa: E402,F401
from proteus_spark.server import QueryServer  # noqa: E402,F401
