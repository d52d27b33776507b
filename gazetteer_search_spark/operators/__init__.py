"""Large-scale training-data pipeline operators (first-class components beyond
the reference's own surface): deduplication, embedding similarity search,
text analysis, multimodal column plumbing. All native DataFrame ops or
Arrow-batched kernels — no per-row Python."""
