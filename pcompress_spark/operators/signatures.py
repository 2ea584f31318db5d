"""Signatures: assembled documents -> content hash + shingle set + MinHash +
SimHash (+ substring window fingerprints), via ONE Arrow-batched
``mapInPandas`` pass.

Reference analogs: per-block SHA-256 (H1, /root/reference/rabin/
rabin_dedup.c:790-797), K-min-values sketches (H3/H4, rabin_dedup.c:684-706,
975-994), rabin shingling (C1, rabin_dedup.c:622-757). The reference
vectorizes these with SSE + OpenMP; we vectorize with numpy over Arrow
batches (kernels.py) — the identical kernels the oracle uses, so engine
signatures == oracle signatures bit-for-bit.

Design notes:
- mapInPandas (not a scalar pandas_udf returning a struct) so the heavy
  ``text`` column is DROPPED on output — downstream stages shuffle only
  hashes, never raw text. At 100 TB input, the signatures table is ~1-2%
  of input size; every later join runs against it.
- NO shuffle in this stage: it maps over whatever partitioning assemble
  produced.
- Arrow batch size (spark.sql.execution.arrow.maxRecordsPerBatch) bounds
  the per-task working set; kernels process MinHash permutations in chunks
  of 16 to cap memory at batch_shingles x 16 x 8B.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..config import DedupConfig
from ..kernels import hash_tokens, signatures_for_texts, trim_after

SIGNATURE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("id_hash", T.LongType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("shingles", T.ArrayType(T.LongType()), False),
        T.StructField("minhash", T.ArrayType(T.LongType()), False),
        T.StructField("simhash", T.LongType(), False),
        T.StructField("win_hashes", T.ArrayType(T.LongType()), False),
        T.StructField("win_positions", T.ArrayType(T.LongType()), False),
    ]
)


def compute_signatures(
    assembled: DataFrame, cfg: DedupConfig, parallelism: int | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(conv_id, n_turns, doc_text) -> signature rows (schema above).

    The stage is CPU-bound Python, so it must not inherit AQE's
    size-coalesced partitioning (AQE targets ~64MB/partition, which is far
    too few tasks for numpy work). Callers should pass an
    assemble(..., parallelism=N)-partitioned input (no extra exchange); the
    optional ``parallelism`` here forces a repartition only when the input
    isn't already pinned.

    ``passthrough``: extra input columns copied verbatim onto the output
    (appended after the signature columns, keeping their input types).
    Streaming callers use it to carry the event-time column through the
    mapInPandas boundary — the watermark tag itself does not survive a
    Python map, so they re-apply withWatermark on the passed-through
    column."""
    if parallelism:
        assembled = assembled.repartition(parallelism, "conv_id")
    schema = SIGNATURE_SCHEMA
    for name in passthrough:
        schema = schema.add(assembled.schema[name])

    def _sign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sig = signatures_for_texts(pdf["doc_text"], cfg)
            if "win_hashes" not in sig.columns:
                sig["win_hashes"] = [[] for _ in range(len(sig))]
                sig["win_positions"] = [[] for _ in range(len(sig))]
            out = pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].values,
                    # deterministic 64-bit id hash (shared kernel) — used for
                    # hot-bucket salting; reproducible in the oracle.
                    # max_token_chars=None: identifiers hash FULL-length —
                    # the 64-char token truncation would deterministically
                    # collide conv_ids sharing a long prefix.
                    "id_hash": hash_tokens(
                        pdf["conv_id"].to_numpy(dtype=np.str_), None
                    ).view(np.int64),
                    "n_turns": pdf["n_turns"].values,
                    "n_tokens": sig["n_tokens"].values,
                    "content_hash": sig["content_hash"].values,
                    "shingles": sig["shingles"].values,
                    "minhash": sig["minhash"].values,
                    "simhash": sig["simhash"].values,
                    "win_hashes": sig["win_hashes"].values,
                    "win_positions": sig["win_positions"].values,
                    **{name: pdf[name].values for name in passthrough},
                }
            )
            yield out

    # trim_after: workers release arena RSS once their partition is done, so
    # idle (reused) Python workers don't starve the following shuffle stage
    out = assembled.mapInPandas(trim_after(_sign), schema=schema)
    # Precompute the LSH band keys as a compact column (bands x 8B vs the
    # num_perm x 8B minhash array): the candidates stage scans the
    # signature table TWICE (bucket sizes + salted membership), and reading
    # 256 B/row of ready keys instead of decoding + slicing + hashing the
    # 1 KB minhash array measurably lifts that stage's core-scaling (JVM
    # array decode is allocation/GC-heavy). Same xxhash64-over-slice
    # expression band_explode would compute — values identical.
    from pyspark.sql import functions as F

    r = cfg.rows
    return out.withColumn(
        "band_hashes",
        F.expr(
            f"transform(sequence(0, {cfg.bands - 1}), "
            f"b -> xxhash64(b, slice(minhash, b * {r} + 1, {r})))"
        ),
    )
