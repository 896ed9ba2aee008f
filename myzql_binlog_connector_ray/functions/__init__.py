"""Large-scale training-data operators: dedup, similarity, text analysis,
multimodal plumbing. All are map_batches-shaped over Arrow/pandas batches."""
