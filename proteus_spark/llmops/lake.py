"""Maintained-lake table helpers shared by the ingest gates.

The partitioned serving lakes (dedup.lsh_lake_write,
similarity.semdedup_lake_write) are parquet tables a stream resolves ONCE
before starting. A ZERO-ROW lake — a fresh deployment, or a corpus slice
where nothing was indexable (e.g. every document too short to shingle) —
writes no part files, and schema inference on the empty directory fails
with AnalysisException where the gate semantics say "no lake -> nothing
is a duplicate" (review r13 #4). The writer therefore records its frame's
schema in a sidecar JSON (driver-side metadata — no extra Spark job, no
row scan), and the reader replays it so an empty lake reads as an empty
frame with the right columns.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SCHEMA_SIDECAR = "_proteus_schema.json"


def write_schema_sidecar(df: DataFrame, path: str) -> None:
    """Record ``df``'s schema next to the table (call AFTER the parquet
    write — mode=overwrite replaces the directory contents).

    Atomic: written to a temp name then ``os.replace``d into place (the
    same commit pattern as minilog.append_epoch's marker), so a reader
    racing the writer sees either the previous sidecar or the new one,
    never a truncated file (ADVICE r13)."""
    os.makedirs(path, exist_ok=True)
    final = os.path.join(path, _SCHEMA_SIDECAR)
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(df.schema.json())
    os.replace(tmp, final)


def lake_read(spark: SparkSession, path: str) -> DataFrame:
    """Read a maintained lake table using the writer-recorded schema when
    present (partition columns included — Spark honors a user-specified
    schema over inference, and an empty table then reads as an empty
    frame instead of raising). Falls back to plain inference for tables
    written before the sidecar existed, and for a sidecar that fails to
    parse (a crash mid-write under the pre-atomic layout, or manual
    damage) — a non-empty lake still reads; only the zero-row edge then
    surfaces inference's empty-directory error, which is the pre-sidecar
    behavior, not a regression."""
    sidecar = os.path.join(path, _SCHEMA_SIDECAR)
    if os.path.exists(sidecar):
        try:
            with open(sidecar) as fh:
                schema = T.StructType.fromJson(json.load(fh))
        except (ValueError, KeyError, TypeError, OSError):
            return spark.read.parquet(path)
        return spark.read.schema(schema).parquet(path)
    return spark.read.parquet(path)
