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


def range_join_pairs(
    df: DataFrame,
    key: str,
    ts_col: str,
    radius: int,
    id_col: str,
) -> DataFrame:
    """Self range-join: pairs of rows with the same ``key`` whose ``ts_col``
    values differ by at most ``radius`` — (key, a_id, b_id, a_ts, b_ts)
    with ``a_id < b_id``.

    Scale shape: a naive range join is a per-key theta join (quadratic in
    the hottest key). Bucketize time into ``radius``-wide buckets instead:
    any qualifying pair lands in the same or adjacent buckets, so the left
    side joins on its exact bucket while the right side explodes into
    {b-1, b, b+1}. The join becomes an EQUI-join on (key, bucket) — one
    hash shuffle, candidates bounded by per-bucket occupancy — and the
    exact |Δts| <= radius predicate filters candidates. Each qualifying
    pair matches exactly once (the right row's three exploded buckets are
    distinct, one of them is the left row's bucket). The reference has no
    range/interval joins at all (SURVEY §2.3).
    """
    bucket = (F.col(ts_col) / F.lit(radius)).cast("long")
    a = df.select(
        F.col(key),
        F.col(id_col).alias("a_id"),
        F.col(ts_col).alias("a_ts"),
        bucket.alias("_b"),
    )
    b = df.select(
        F.col(key),
        F.col(id_col).alias("b_id"),
        F.col(ts_col).alias("b_ts"),
        F.explode(
            F.array(bucket - 1, bucket, bucket + 1)
        ).alias("_b"),
    )
    return (
        a.join(b, [key, "_b"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_ts") - F.col("b_ts")) <= radius)
        )
        .select(key, "a_id", "b_id", "a_ts", "b_ts")
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (skewed) fact side, replicate the
    dim side once per salt value, join on (key, salt).

    The classic hot-key fix when the dim side is too large to broadcast
    and one key dominates the fact table: a plain shuffle join sends every
    hot-key row to ONE reducer; salting fans the hot key over
    ``salt_buckets`` reducers at the cost of a ``salt_buckets``x dim
    replication (cheap when |dim| << |facts|). AQE's skew-join split
    handles moderate skew automatically — this is the explicit form for
    the extreme case (or engines/runs with AQE off). Results are exactly
    the plain join's: salt is internal and dropped.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (skewed fact side)")
    salted = facts.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted.join(replicated, on=[key, "_salt"], how=how).drop("_salt")
