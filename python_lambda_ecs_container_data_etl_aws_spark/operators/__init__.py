"""Large-scale training-data operators: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search (brute-force + LSH-bucketed
ANN), text analysis, and multimodal column plumbing.

Exact variants double as correctness oracles for the approximate ones:
tests assert the LSH paths recover what the exact paths find."""
