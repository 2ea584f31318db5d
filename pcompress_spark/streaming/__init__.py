from .dedup_stream import (
    signatures_stream,
    start_near_dup_stream,
    stateful_assemble_signatures,
    streaming_exact_dedup,
)

__all__ = [
    "signatures_stream",
    "start_near_dup_stream",
    "stateful_assemble_signatures",
    "streaming_exact_dedup",
]
