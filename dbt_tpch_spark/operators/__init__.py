"""Large-scale training-data pipeline operators (extension surface beyond
the reference's relational models): text analysis, deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search
(brute-force + LSH ANN), and multimodal column plumbing.

All hot-path logic is JVM-side Column expressions (no Python UDFs) except
the multimodal decode stage, which is deliberately a ``mapInPandas`` to
exercise the Arrow batch path (the real image/audio decode is stubbed —
libraries not present in this environment).
"""
