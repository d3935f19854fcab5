"""LLM-training-data pipeline operators, designed for 100 TB scale.

These go beyond the reference's own surface (SURVEY §2.6: it has no joins/
aggregations at all) — they are the operations a large-scale training-data
pipeline needs, built Spark-first:

- ``dedup``      exact + MinHash-LSH + SimHash + n-gram Jaccard near-dup,
                 plus connected-component dup clustering
- ``similarity`` brute-force and LSH/IVF-bucketed cosine top-k ANN
- ``text``       language-ID, quality scores, token counts, fingerprints,
                 repetition (duplicate-n-gram) signals
- ``sampling``   deterministic hash sampling + per-domain quotas,
                 weighted/mixture/stratified/token-budget variants
- ``joins``      as-of, interval, salted, bucketed, fuzzy-trigram joins
- ``asof``       as-of temporal join plan
- ``ivm``        incremental view maintenance (signed-partial rollups)
- ``profile``    one-scan per-column table profiling
- ``multimodal`` binary-column decode/feature plumbing with REAL
                 WAV/PPM/BMP/PNG kernels (pandas-UDF shaped)
- ``graph``      PageRank power iteration, degree-ordered triangle
                 counting
- ``web``        URL canonicalization, canonical-URL dedup, domain stats
- ``sketches``   KMV distinct (+ set algebra), Count-Min (+ join-size
                 estimation), histogram quantiles, Bloom semi-join —
                 mergeable, bounded-state, md5-deterministic
- ``bigdecimal`` exact >38-digit aggregation via DECIMAL(38) limbs

Every operator is shuffle-partitioned (no driver materialization, no
all-pairs joins) and stays in Catalyst built-ins where possible.
"""

from . import (asof, bigdecimal, dedup, graph, ivm, joins,  # noqa: F401
               multimodal, profile, sampling, similarity, sketches,
               text, web)
