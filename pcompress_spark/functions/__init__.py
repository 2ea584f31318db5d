from . import doc_dedup, multimodal, similarity, text

__all__ = ["doc_dedup", "multimodal", "similarity", "text"]
