from .dedup_stream import signatures_stream, streaming_exact_dedup

__all__ = ["signatures_stream", "streaming_exact_dedup"]
