"""Engine-portable scalar/array function builders.

The reference has no scalar-function surface at all (SURVEY §2.10) — these
modules are part of the beyond-reference LLM-pipeline layer. Each builder
emits ONE SQL snippet valid in both Spark SQL and DuckDB, so the Spark
implementation (via ``F.expr``) and the DuckDB oracle execute literally the
same algorithm — the correctness gate then checks Spark's distributed
execution, not a reimplementation.
"""

from proteus_spark.functions.texthash import (  # noqa: F401
    hex_to_long_sql,
    md5_seeded_sql,
    portable_hash_sql,
)
