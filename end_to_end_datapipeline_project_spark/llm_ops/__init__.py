"""LLM-training-data pipeline operators (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal columns.

These are first-class engine components designed for 100 TB corpora:

- ``text``       — language-ID, quality scoring, token counting,
                   fingerprinting (all built-in Column exprs, no UDFs)
- ``dedup``      — exact hash dedup, MinHash-LSH, SimHash, n-gram Jaccard
- ``similarity`` — brute-force cosine top-k baseline + IVF-bucketed ANN
- ``multimodal`` — opaque binary media columns + mapInPandas decode/feature
                   plumbing (decode kernels stubbed: no media libs here)
"""
