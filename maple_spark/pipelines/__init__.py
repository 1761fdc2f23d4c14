"""Training-data pipeline operators (engine extensions beyond the reference).

The reference is a classic RDBMS; these modules add the operations a
100 TB LLM-data pipeline needs, built on the same Spark-first principles:
declarative DataFrame plans, JVM-side expressions, shuffles only on
key-reduced data (signatures/buckets, never raw text), and Pandas UDFs only
where arithmetic genuinely needs NumPy.

    dedup       exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
                cosine, connected-component clustering
    similarity  brute-force cosine top-k, SRP-LSH + IVF ANN, exact blocked
                gram-matrix near-dup, SemDeDup cluster-then-prune
    curation    benchmark decontamination, repetition signals, PII scrub
    textstats   language-ID, quality scores, token counts, fingerprints
    multimodal  binary media columns: schema, batching, stubbed decoders
    sampling    deterministic hash splits, per-group quotas, domain mix,
                Efraimidis-Spirakis weighted reservoir
    inference   Arrow-batched embedding inference plumbing (stub encoder)
"""
