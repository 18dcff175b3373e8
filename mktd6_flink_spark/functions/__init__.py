"""LLM-pipeline function layer: portable hashing, dedup, similarity
search, text analysis, multimodal plumbing."""

from . import dedup, hashing, multimodal, similarity, text

__all__ = ["dedup", "hashing", "multimodal", "similarity", "text"]
