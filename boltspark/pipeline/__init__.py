"""Training-data pipeline operators over document/embedding tables:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis (language id, quality scores, token counts, fingerprints),
and multimodal column plumbing (binary payloads + typed metadata)."""
