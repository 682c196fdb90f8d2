"""Join operators.

Reference parity: the JoinQPU is a pre-configured 2-table equi-join that is
really a **keyed merge/coalesce** — rows from either input with the same
join-key value merge into one wide row; a side that never produced a row
leaves its INT attributes defaulted to 0 (reference:
internal/qpu_classes/join/join.go:148-189,352-379,393-456; default-0 at
join.go:414-423; exactly-2-tables assertion at join.go:149).

Spark shape: full-outer equi-join + per-column ``coalesce`` with the side's
default. Catalyst picks broadcast/sort-merge/shuffled-hash; at 100 TB a
dim-side ``broadcast()`` hint or AQE handles strategy — nothing here is
single-node, unlike the reference's in-process ``map[int32]`` state
(join.go:59-62).

Standard joins (inner/left/semi/anti/cross) are exposed via plain
``DataFrame.join`` — the reference has none of them (SURVEY §2.3), Spark
gives them free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyed_merge_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    key_alias: str | None = None,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Keyed merge of two inputs on an equi-key (JoinQPU semantics).

    - one output row per key value present in EITHER input
      (join.go:352-379)
    - the join key is surfaced once, optionally renamed to the configured
      ``JoinedAttributeAlias`` (types.go:142-146)
    - missing-side attributes take ``defaults`` (reference defaults INT
      attrs to 0 — join.go:414-423); unlisted columns stay NULL.
    """
    defaults = defaults or {}
    lcols = [c for c in left.columns if c != key]
    rcols = [c for c in right.columns if c != key]
    dup = set(lcols) & set(rcols)
    if dup:
        raise ValueError(f"non-key columns collide: {sorted(dup)}")

    out = left.join(right, on=key, how="full_outer")
    proj = [F.col(key).alias(key_alias or key)]
    for c in lcols + rcols:
        if c in defaults:
            proj.append(F.coalesce(F.col(c), F.lit(defaults[c])).alias(c))
        else:
            proj.append(F.col(c))
    return out.select(*proj)
