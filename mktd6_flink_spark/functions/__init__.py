"""Scalar / table function layer: portable hashing, dedup, similarity search,
text analysis, multimodal column plumbing — the large-scale training-data
pipeline surface that complements the reference's operator inventory."""
