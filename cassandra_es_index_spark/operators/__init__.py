"""Scale operators beyond the reference surface (SURVEY.md §7 phase 5).

``dedup``      — exact, n-gram-Jaccard (token-blocked, exact), MinHash-LSH
                 (scale path), SimHash.
``similarity`` — brute-force cosine top-k; LSH-bucketed ANN (scale path).
``multimodal`` — binary media columns with typed metadata; decode/feature
                 plumbing as Arrow-batched pandas transforms (decode stubbed
                 — media libs not in the image).
"""
