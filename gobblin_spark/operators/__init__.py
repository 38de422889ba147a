"""Training-data pipeline operators — first-class components alongside the
CDC engine: dedup families (exact, minhash-LSH, simhash, n-gram Jaccard),
similarity search, text analysis, multimodal column plumbing, fork routing.

All are DataFrame-native (JVM expressions / higher-order functions) except
where Python is genuinely required, in which case Arrow-batched pandas UDFs
are used (never per-row Python UDFs).
"""
