"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference routes ~40 content types to type-specific filters (perfect-
hash extension detector /root/reference/utils/phash/phash.c via
pc_archive.c:108-110; packJPG for images, wavpack for audio — dispatch at
/root/reference/pcompress.c:205-401). This module is that router for a
Spark table: media rides as an opaque ``binary`` column with typed
metadata; decode/feature steps are Arrow-batched ``mapInPandas`` UDFs.

The container has no image/audio codecs, so the decode kernel is STUBBED:
``decode_stub=True`` (default) produces a deterministic fake feature vector
derived from the payload bytes (splitmix64 — reproducible, content-
addressed); ``decode_stub=False`` raises NotImplementedError where a real
codec (pillow/ffmpeg) would plug in. All Spark-side plumbing — schema,
batching, partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import splitmix64, trim_after

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),      # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),     # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_sha_like", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 32


def _fake_feature(payload: bytes | None) -> np.ndarray:
    """Deterministic content-addressed pseudo-feature (the stub decode)."""
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    b = np.frombuffer(payload, dtype=np.uint8)
    base = np.uint64(int(b[: 64].astype(np.uint64).sum()) + len(b))
    h = splitmix64(np.arange(FEATURE_DIM, dtype=np.uint64) + base * np.uint64(2654435761))
    return (h.astype(np.float64) / 2**64).astype(np.float32)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """media table -> feature rows via mapInPandas (Arrow batches carry the
    binary payload; partitioning is preserved — map-only, no shuffle).

    At scale: payloads should be size-bucketed (repartitionByRange on a
    payload-size column) so Arrow batches stay near-uniform in bytes, and
    spark.sql.execution.arrow.maxRecordsPerBatch set low enough that
    batch_rows x max_payload fits executor memory.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires pillow/ffmpeg; not available "
                    "in this container — run with decode_stub=True"
                )
            feats = [_fake_feature(p) for p in pdf["payload"]]
            hashes = [
                int(splitmix64(np.uint64(len(p) if p is not None else 0)))
                - 2**63 for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload_sha_like": np.array(hashes, dtype=np.int64),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        trim_after(_extract), schema=FEATURE_SCHEMA
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8))
        rows.append(
            (i, kind, f"application/x-fake-{kind}", payload,
             int(rng.integers(16, 512)) if kind == "image" else None,
             int(rng.integers(16, 512)) if kind == "image" else None,
             int(rng.integers(1000, 60000)) if kind != "image" else None)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
