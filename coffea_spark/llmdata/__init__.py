"""LLM-training-data pipeline operators (beyond the reference surface).

Per BASELINE.json's north star: deduplication (exact / MinHash-LSH /
SimHash / n-gram Jaccard / embedding-cosine), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language id, quality
scoring, token stats, fingerprinting), and multimodal binary-column
plumbing — every operator designed for the 100 TB path (hash-partitioned
shuffles on content keys, no driver-side loops, no per-row Python except
clearly-marked decode stubs).
"""

from coffea_spark.llmdata import dedup, similarity, text, multimodal  # noqa: F401
