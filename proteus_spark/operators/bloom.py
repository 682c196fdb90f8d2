"""Mergeable Bloom filter — membership member of the sketch family.

The semi-join pruning story at 100 TB: build a KB-sized bit filter over a
join/filter key once (per partition/month, merged by bitwise OR — the
same rollup shape as the HLL/histogram/CMS sketches), then probe
candidate keys without touching the table. Spark's own runtime bloom
pruning (InjectRuntimeFilter) is automatic for joins; this exposes the
structure as a first-class, persistable operator the way the reference
exposes its index state.

Representation: ``bits`` positions packed 62 per BIGINT word (62, not 64,
so no shift ever reaches the sign bit — both engines' ``<<`` stay in
defined territory). The filter is the ≤ ceil(bits/62)-row relation
(word, bits); build is explode(positions) → groupBy(word) → bit_or —
pure integer arithmetic on portable md5 hashes, so DuckDB replays it
bit-for-bit (no false negatives is a THEOREM here, checked row-by-row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from proteus_spark.functions.texthash import bucket_exprs_sql

BLOOM_BITS = 1024
BLOOM_HASHES = 3
WORD_BITS = 62


def _positions(col_sql: str, bits: int, hashes: int) -> list:
    return [F.expr(e) for e in bucket_exprs_sql(col_sql, "bloom", hashes, bits)]


def bloom_build(
    df: DataFrame,
    col: str,
    partial_by: str | None = None,
    bits: int = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """(word, bits) filter relation; with ``partial_by``, per-group
    partials first (the mergeable-rollup path), then bit_or-merged."""
    pos = df.select(
        *([partial_by] if partial_by else []),
        F.posexplode(
            F.array(*_positions(f"CAST({col} AS STRING)", bits, hashes))
        ).alias("_d", "pos"),
    ).select(
        *([partial_by] if partial_by else []),
        F.floor(F.col("pos") / WORD_BITS).cast("long").alias("word"),
        # the Python shiftleft helper takes only a literal shift; the SQL
        # form shifts by a column
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))"
        ).alias("mask"),
    )
    if partial_by:
        partial = pos.groupBy(partial_by, "word").agg(
            F.bit_or("mask").alias("bits")
        )
        return partial.groupBy("word").agg(F.bit_or("bits").alias("bits"))
    return pos.groupBy("word").agg(F.bit_or("mask").alias("bits"))


def bloom_probe(
    candidates: DataFrame,
    bloom: DataFrame,
    col: str,
    bits: int = BLOOM_BITS,
    hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """(candidate, maybe_present): 1 iff EVERY hash position's bit is set.
    The filter is ≤ ceil(bits/62) rows — broadcast by construction."""
    pos = candidates.select(
        F.col(col).alias("candidate"),
        F.posexplode(
            F.array(*_positions(f"CAST({col} AS STRING)", bits, hashes))
        ).alias("_d", "pos"),
    ).select(
        "candidate",
        F.floor(F.col("pos") / WORD_BITS).cast("long").alias("word"),
        (F.col("pos") % WORD_BITS).cast("int").alias("bit"),
    )
    hit = (
        pos.join(F.broadcast(bloom), "word", "left")
        .select(
            "candidate",
            F.expr(
                "shiftright(coalesce(bits, CAST(0 AS BIGINT)), bit) "
                "& CAST(1 AS BIGINT)"
            ).alias("hit"),
        )
    )
    return hit.groupBy("candidate").agg(
        F.min("hit").cast("integer").alias("maybe_present")
    )
