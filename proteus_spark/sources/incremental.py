"""Batch-incremental ingestion + table maintenance.

Two primitives every lake-scale training pipeline runs between "files land
in the bucket" and "operators read clean tables":

- ``IncrementalScan`` — a file-level bookmark: each ``new_files()`` batch
  reads ONLY objects not seen by a previous committed run (the batch
  counterpart of the streaming file source's checkpoint; reference
  equivalent: the snapshot/subscribe split, queries.go:81-116, done with
  files instead of a log). State is a tiny JSON manifest of processed file
  names — list-compare-read, no data rewrite, restart-safe via
  write-then-rename.
- ``compact_table`` — small-file compaction: replay a parquet dir into
  ~``target_mb`` files (optionally range-clustered on a sort key so
  min/max footer stats prune range predicates afterwards). Micro-batch
  sinks and incremental ingests accrete small files; at 100 TB unmerged
  small files turn every scan into an open()-bound listing storm.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class IncrementalScan:
    """File-bookmark incremental reads over a growing parquet directory.

    ``new_files()`` returns (DataFrame over unseen files, file list);
    ``commit(files)`` marks them processed AFTER the caller's job
    succeeded — crash between read and commit re-delivers the same batch
    (at-least-once, same contract as a streaming source's offset log; pair
    with an idempotent sink or the engine's epoch guard for exactly-once).
    """

    def __init__(self, spark: SparkSession, path: str, bookmark: str | None = None):
        self.spark = spark
        self.path = path
        self.bookmark = bookmark or os.path.join(path, "_bookmark.json")

    def _seen(self) -> set[str]:
        try:
            with open(self.bookmark) as f:
                return set(json.load(f)["files"])
        except (OSError, ValueError, KeyError):
            return set()

    def new_files(self) -> tuple[DataFrame | None, list[str]]:
        seen = self._seen()
        fresh = sorted(
            f
            for f in os.listdir(self.path)
            if f.endswith(".parquet") and f not in seen
        )
        if not fresh:
            return None, []
        df = self.spark.read.parquet(
            *[os.path.join(self.path, f) for f in fresh]
        )
        return df, fresh

    def commit(self, files: list[str]) -> None:
        done = sorted(self._seen() | set(files))
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self.bookmark))
        with os.fdopen(fd, "w") as f:
            json.dump({"files": done}, f)
        os.replace(tmp, self.bookmark)  # atomic publish, restart-safe


def compact_table(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_col: str | None = None,
) -> int:
    """Rewrite the parquet dir at ``path`` into ~``target_mb``-sized files;
    returns the resulting file count.

    ``sort_col``: range-cluster output files on this column —
    repartitionByRange gives each file a disjoint value range, so parquet
    footer min/max stats prune range predicates post-compaction (the
    poor-man's OPTIMIZE ... ZORDER for the 1-D case; the 2-D Morton
    variant lives in operators/index.py). Content is preserved exactly;
    the swap is write-to-scratch + atomic directory replace.

    Only data files (``*.parquet``, ``_SUCCESS``) participate in the swap —
    sidecars such as IncrementalScan's ``_bookmark.json`` stay in place.
    Note that compaction rewrites file NAMES: a scan bookmarking this
    directory will re-deliver the rewritten files as new. Either compact
    only directories no IncrementalScan is bookmarking, or ``commit()`` the
    post-compaction file list to the bookmark before the next poll."""
    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    n = max(1, round(total / (target_mb * 1024 * 1024)))
    out = (
        df.repartitionByRange(n, sort_col)
        if sort_col is not None
        else df.coalesce(n)
    )
    scratch = tempfile.mkdtemp(prefix="proteus_compact_")
    out.write.mode("overwrite").parquet(scratch)
    old = tempfile.mkdtemp(prefix="proteus_compact_old_")
    for f in os.listdir(path):
        # swap only data files; sidecars (_bookmark.json etc.) stay put
        if f.endswith(".parquet") or f == "_SUCCESS" or f.endswith(".crc"):
            shutil.move(os.path.join(path, f), os.path.join(old, f))
    for f in os.listdir(scratch):
        shutil.move(os.path.join(scratch, f), os.path.join(path, f))
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(scratch, ignore_errors=True)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
