from . import doc_dedup, kmv, multimodal, similarity, text

__all__ = ["doc_dedup", "kmv", "multimodal", "similarity", "text"]
