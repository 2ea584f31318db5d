from .assemble import assemble, assembled_turns
from .candidates import band_explode, candidate_pairs
from .cluster import connected_components
from .signatures import compute_signatures
from .substring import substring_pairs
from .verify import verify_pairs

__all__ = [
    "assemble",
    "assembled_turns",
    "band_explode",
    "candidate_pairs",
    "connected_components",
    "compute_signatures",
    "substring_pairs",
    "verify_pairs",
]
