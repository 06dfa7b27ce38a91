"""LLM-training-data operators: dedup, similarity search, text analysis, multimodal."""
