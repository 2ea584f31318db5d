"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference routes ~40 content types to type-specific filters (perfect-
hash extension detector /root/reference/utils/phash/phash.c via
pc_archive.c:108-110; packJPG for images, wavpack for audio — dispatch at
/root/reference/pcompress.c:205-401). This module is that router for a
Spark table: media rides as an opaque ``binary`` column with typed
metadata; decode/feature steps are Arrow-batched ``mapInPandas`` UDFs.

One REAL decoder ships in-tree, mirroring the reference's dependency-free
PNM filter (/root/reference/filters/packpnm/packpnm.c): a numpy P5/P6
parser. Image payloads that parse as PNM get a real pixel-histogram
feature; other kinds (audio/video — their codecs aren't in this container)
fall back to a deterministic content-addressed stub behind
``decode_stub=True``, or raise NotImplementedError when decode_stub=False.
All Spark-side plumbing — schema, batching, partitioning, UDF signatures —
is real and identical for both paths.

``payload_sha_like`` is a true CONTENT hash (kernels.hash_bytes_rows —
FNV-1a over every byte + splitmix avalanche), usable as an exact-dup key.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..kernels import hash_bytes_rows, splitmix64, trim_after

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
        T.StructField("decoded", T.BooleanType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)

FEATURE_DIM = 32


# ---------------------------------------------------------------------------
# real decoder: PNM (P5 grayscale / P6 RGB, 8-bit) — numpy, no dependencies
# ---------------------------------------------------------------------------

def decode_pnm(payload: bytes | None) -> np.ndarray | None:
    """Parse a binary PNM payload (P5 gray / P6 RGB, maxval <= 255) into a
    uint8 array of raster bytes; None if the payload is not valid PNM.
    Mirrors the reference's in-tree PNM parser
    (/root/reference/filters/packpnm/packpnm.c) in scope: header tokens may
    be separated by whitespace and '#' comments; raster follows the single
    whitespace byte after maxval."""
    if not payload or payload[:2] not in (b"P5", b"P6"):
        return None
    channels = 1 if payload[:2] == b"P5" else 3
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        c = payload[pos]
        if c in b" \t\r\n":
            pos += 1
        elif c == ord("#"):
            while pos < n and payload[pos] != ord("\n"):
                pos += 1
        else:
            start = pos
            while pos < n and payload[pos] not in b" \t\r\n":
                pos += 1
            tokens.append(payload[start:pos])
    if len(tokens) < 3 or pos >= n:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    if w <= 0 or h <= 0 or not (0 < maxval <= 255):
        return None
    pos += 1  # the single whitespace byte after maxval
    need = w * h * channels
    if n - pos < need:
        return None
    return np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)


def raster_histogram(raster: np.ndarray, bins: int = FEATURE_DIM) -> np.ndarray:
    """Normalized ``bins``-bin histogram of raster bytes (float32) — the
    deterministic image feature. bins must divide 256."""
    shift = (256 // bins).bit_length() - 1   # e.g. 32 bins -> >> 3
    counts = np.bincount(raster >> shift, minlength=bins)[:bins]
    return (counts / max(len(raster), 1)).astype(np.float32)


def _fake_feature(content_hash: np.uint64) -> np.ndarray:
    """Deterministic content-addressed pseudo-feature (the stub decode for
    kinds whose codecs aren't available): seeded by the FULL content hash."""
    h = splitmix64(
        np.arange(FEATURE_DIM, dtype=np.uint64)
        + content_hash * np.uint64(2654435761)
    )
    return (h.astype(np.float64) / 2**64).astype(np.float32)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """media table -> feature rows via mapInPandas (Arrow batches carry the
    binary payload; partitioning is preserved — map-only, no shuffle).

    Routing (the D6 type dispatch): payloads that parse as PNM decode for
    real (pixel-byte histogram, ``decoded=True``); anything else uses the
    content-addressed stub when decode_stub=True or raises
    NotImplementedError otherwise (real JPEG/audio codecs would plug in
    here).

    At scale: payloads should be size-bucketed (repartitionByRange on a
    payload-size column) so Arrow batches stay near-uniform in bytes, and
    spark.sql.execution.arrow.maxRecordsPerBatch set low enough that
    batch_rows x max_payload fits executor memory.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = list(pdf["payload"])
            hashes = hash_bytes_rows(payloads)
            feats, decoded = [], []
            for p, h in zip(payloads, hashes):
                raster = decode_pnm(p)
                if raster is not None:
                    feats.append(raster_histogram(raster))
                    decoded.append(True)
                elif decode_stub:
                    feats.append(_fake_feature(h))
                    decoded.append(False)
                else:
                    raise NotImplementedError(
                        "no in-tree decoder for this payload (PNM is the only "
                        "bundled codec; pillow/ffmpeg are not available in "
                        "this container) — run with decode_stub=True"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload_sha_like": hashes.view(np.int64),
                    "decoded": np.asarray(decoded, dtype=bool),
                    "feature": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        trim_after(_extract), schema=FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# deterministic fixtures (no external data; oracle reads the same parquet)
# ---------------------------------------------------------------------------

def generate_media_pdf(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic fake media table: image payloads are VALID binary PGM
    (P5) files with the canonical header 'P5\\n{w} {h}\\n255\\n'; audio/video
    payloads are opaque seeded bytes."""
    rng = np.random.Generator(np.random.PCG64(seed))
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w = int(rng.integers(16, 64))
            h = int(rng.integers(16, 64))
            raster = rng.integers(0, 256, size=w * h, dtype=np.uint8)
            payload = f"P5\n{w} {h}\n255\n".encode("ascii") + raster.tobytes()
            rows.append((i, kind, "image/x-portable-graymap", payload, w, h, None))
        else:
            size = int(rng.integers(64, 2048))
            payload = bytes(rng.integers(0, 256, size=size, dtype=np.uint8))
            rows.append((i, kind, f"application/x-fake-{kind}", payload,
                         None, None, int(rng.integers(1000, 60000))))
    return pd.DataFrame(
        rows,
        columns=["media_id", "kind", "mime", "payload", "width", "height",
                 "duration_ms"],
    )


def media_fixture_path(n: int = 64, seed: int = 42) -> str:
    """Write (once) the deterministic media fixture as parquet under the
    repo .cache and return the file path — the single source both the Spark
    query and the DuckDB oracle read."""
    from ..sources.tables import CACHE_DIR

    out_dir = os.path.join(CACHE_DIR, f"media_n{n}_s{seed}")
    path = os.path.join(out_dir, "media.parquet")
    if not os.path.exists(path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(out_dir, exist_ok=True)
        pdf = generate_media_pdf(n, seed)
        schema = pa.schema([
            ("media_id", pa.int64()), ("kind", pa.string()),
            ("mime", pa.string()), ("payload", pa.binary()),
            ("width", pa.int32()), ("height", pa.int32()),
            ("duration_ms", pa.int64()),
        ])
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pandas(pdf, schema=schema), tmp)
        os.replace(tmp, path)
    return path


def load_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    return spark.read.parquet(media_fixture_path(n, seed))


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (in-memory variant)."""
    pdf = generate_media_pdf(n, seed)
    rows = [tuple(None if pd.isna(v) else v for v in r)
            for r in pdf.itertuples(index=False)]
    rows = [
        (int(r[0]), r[1], r[2], r[3],
         None if r[4] is None else int(r[4]),
         None if r[5] is None else int(r[5]),
         None if r[6] is None else int(r[6]))
        for r in rows
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
