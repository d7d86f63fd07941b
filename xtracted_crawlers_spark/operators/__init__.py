"""Pipeline operators beyond the reference's own surface: large-scale
training-data operations (dedup, similarity search, text analysis,
multimodal plumbing) over the documents/embeddings tables."""
