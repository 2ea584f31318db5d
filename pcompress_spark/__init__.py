"""pcompress_spark — a from-scratch PySpark-native near-duplicate detection
and clustering engine with the dedup semantics of moinakg/pcompress,
re-expressed over tables of multi-turn conversation transcripts.

Reference: /root/reference (pcompress v3.1). This is NOT a port: the
reference is a single-node C pipeline (threads + semaphores + a shared
in-memory hash index); this engine declares the same semantics as Spark
DataFrame plans (shuffle replaces the shared index, deterministic min-key
representatives replace the serialized index ring) and keeps only the
signature math in Arrow-vectorized numpy kernels.
"""

from .config import DEFAULT_CONFIG, DedupConfig

__all__ = ["DedupConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
