"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference's data model is exactly this shape — an object is a key, an
UNINTERPRETED BLOB, and metadata attributes (reference:
Documentation.md:23-33; S3 objects with x-amz-meta-* attributes,
internal/qpu_classes/datastore_driver/s3/store.go:146-200). Here the blob
becomes a ``binary`` column with a metadata struct, and per-modality
decode/feature-extraction runs as Arrow-batched ``mapInPandas`` — the
Spark-side plumbing (schema, batch shape, partition parallelism) is real;
actual image/audio codecs are stubbed behind NotImplementedError because
the decode libraries are not in this environment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTRACT_SCHEMA = "doc_id long, modality string, n_bytes long, magic string"


def to_binary_assets(docs: DataFrame) -> DataFrame:
    """Wrap documents as multimodal assets: (doc_id, payload binary,
    modality, meta struct). For testdata the payload is the utf-8 encoding
    of the text; real pipelines would read image/audio bytes the same way
    (spark.read.format('binaryFile') yields an identical shape)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text").alias("modality"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode/extract pass over binary payloads.

    mapInPandas keeps partition parallelism and streams batches through
    Python once — the correct shape for CPU-bound media work at scale
    (repartition upstream to size batches; no driver involvement).

    text -> byte length + 4-byte magic prefix. Other modalities are where a
    real decoder plugs in (PIL/librosa/ffmpeg) — stubbed deterministically.

    The batch function is a CLOSURE on purpose: cloudpickle then ships it
    by value, so executor Python workers need no importable copy of this
    package (the external driver runs us from an arbitrary cwd).
    """

    def _magic(payload: bytes, modality: str) -> str:
        if modality == "text":
            return bytes(payload[:4]).decode("utf-8", errors="replace")
        # Real decoders (image resize, audio resample, video frame-sample)
        # are not available in this environment; the plumbing around them
        # is what a worker would execute.
        raise NotImplementedError(f"decoder for modality {modality!r} is stubbed")

    def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "magic": [
                        _magic(payload, modality)
                        for payload, modality in zip(pdf["payload"], pdf["modality"])
                    ],
                }
            )

    return assets.mapInPandas(_extract_batch, schema=EXTRACT_SCHEMA)
