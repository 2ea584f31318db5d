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
