"""Table access: driver-provided parquet + self-generated transcript fixtures.

Reference analog: the plain/content-aligned chunk readers (S1/S2,
/root/reference/utils/utils.c:210-278). On a real deployment these reads go
through an Iceberg catalog (spark.read.format("iceberg")); the sandbox has
plain parquet, which exercises the same scan/pushdown machinery.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import datagen

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CACHE_DIR = os.path.join(REPO_ROOT, ".cache")

# conversations per driver scale tier (sf0.1 sized so bench runs > 60 s at local[8])
_SF_CONVS = {"sf0.001": 200, "sf0.01": 1000, "sf0.1": 5000}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def transcripts_path(sf_dir: str, n_conv: int | None = None, seed: int = 42) -> str:
    """Deterministic transcript fixture for the given scale dir (generated
    once under repo .cache; seed-fixed, no external data)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    n = n_conv or _SF_CONVS.get(tag, 1000)
    out = os.path.join(CACHE_DIR, f"transcripts_{tag}_s{seed}_n{n}")
    datagen.ensure_dataset(out, seed=seed, n_conv=n)
    return os.path.join(out, "transcripts.parquet")


def load_transcripts(spark: SparkSession, sf_dir: str, n_conv: int | None = None,
                     seed: int = 42) -> DataFrame:
    return spark.read.parquet(transcripts_path(sf_dir, n_conv, seed))


# (source_tag, seed, conv-count scale) for the multi-source union scan:
# src2 is a byte-identical mirror of src0 (the re-crawl scenario — every
# src0 conversation has a cross-source exact duplicate), src1 is fresh
# content, so provenance groups exercise both n_sources = 1 and 2.
MULTI_SOURCES = (("src0", 42, 1.0), ("src1", 43, 0.5), ("src2", 42, 1.0))


def load_transcripts_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3-analog union scan: several transcript sources read as ONE table
    with per-row provenance. The reference walks archive members and tags
    each with its origin + detected type (/root/reference/archive/
    pc_archive.c:108-110); here each source's conv_ids are namespaced with
    the source tag (real multi-crawl pipelines must — ids collide across
    dumps) and a ``source`` column flows into every downstream stage.

    Scale shape: a UNION of parquet/Iceberg scans is still one distributed
    scan; the source tag is a literal projected map-side (no shuffle)."""
    from pyspark.sql import functions as F

    parts = []
    for tag, seed, scale in MULTI_SOURCES:
        tagged = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
        n = max(int(_SF_CONVS.get(tagged, 1000) * scale), 10)
        df = spark.read.parquet(transcripts_path(sf_dir, n_conv=n, seed=seed))
        parts.append(
            df.select(
                F.concat(F.lit(tag + "/"), F.col("conv_id")).alias("conv_id"),
                "turn_idx", "role", "text", "tool", "ts",
                F.lit(tag).alias("source"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def multi_source_paths(sf_dir: str) -> list[tuple[str, str]]:
    """(tag, parquet path) per source — for the DuckDB oracle."""
    tagged = os.path.basename(os.path.normpath(sf_dir)) or "sf0.01"
    return [
        (tag, transcripts_path(sf_dir,
                               n_conv=max(int(_SF_CONVS.get(tagged, 1000) * scale), 10),
                               seed=seed))
        for tag, seed, scale in MULTI_SOURCES
    ]
