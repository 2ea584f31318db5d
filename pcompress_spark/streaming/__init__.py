from .dedup_stream import (
    signatures_stream,
    stateful_assemble_signatures,
    streaming_exact_dedup,
)

__all__ = [
    "signatures_stream",
    "stateful_assemble_signatures",
    "streaming_exact_dedup",
]
