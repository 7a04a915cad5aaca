"""Training-data pipeline operators: dedup, similarity search, text stats,
multimodal plumbing — the operations a 100 TB pretraining-data pipeline
needs on top of the search engine core."""
