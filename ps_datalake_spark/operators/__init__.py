"""First-class operators the built-in Spark surface doesn't ship directly:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search over embeddings, text analysis, and multimodal column plumbing.

All hot paths are JVM-side built-in expressions (higher-order array functions,
xxhash64, bit ops); Python appears only as Arrow-batched pandas UDFs where a
per-row algorithm genuinely needs it (SimHash bit packing, multimodal decode).
"""
