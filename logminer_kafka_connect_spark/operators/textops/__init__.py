"""Training-data pipeline operators over document/embedding tables.

Not in the reference (its payload is opaque); required as first-class
components for the 100 TB web-text target: deduplication (exact, MinHash-
LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language id, quality
score, token counts, fingerprinting), and multimodal column plumbing.

Design rule: JVM-side built-ins wherever the semantics allow (all hashing
is ``md5``-derived so DuckDB oracles can replicate bit-for-bit); Python
appears only in Arrow-vectorized UDFs (ANN hyperplanes, fake decoders).
"""
