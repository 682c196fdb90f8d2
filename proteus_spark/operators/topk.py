"""Top-k operator.

Reference parity: ORDER BY <attr> [ASC|DESC] LIMIT k is the reference's
top-k (test query ``ORDER BY vote_sum DESC LIMIT 5`` —
internal/sqlparser/sqlparser_test.go:42-56; single-attribute ORDER BY parsed
at sqlparse.go:223-250, LIMIT at sqlparse.go:252-265).

Spark plans this as TakeOrderedAndProject: each partition keeps a local
k-heap, the driver merges k*numPartitions candidates — no global sort, no
full shuffle. That is the correct 100 TB plan and it is automatic.

Deviation: the reference's ordering among ties is backend-dependent
(delegated to MySQL ORDER BY — mysql_backend.go:349-353). We take explicit
tie-break columns so results are deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk(
    df: DataFrame,
    by: str,
    k: int,
    descending: bool = True,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    order = [F.col(by).desc() if descending else F.col(by).asc()]
    order += [F.col(c).asc() for c in (tiebreak or [])]
    return df.orderBy(*order).limit(k)
