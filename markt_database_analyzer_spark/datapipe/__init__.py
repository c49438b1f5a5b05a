"""Large-scale training-data pipeline operators (SURVEY.md §7 Phase 4).

These extend the reference's analytics surface with the operators a 100 TB
LLM-data pipeline needs, all Spark-first:

- ``dedup``      : exact, MinHash+LSH banding, SimHash, n-gram Jaccard
- ``similarity`` : brute-force cosine top-k; IVF (label-partitioned) ANN
- ``text``       : language-ID heuristic, quality scoring, token counting,
                   document fingerprinting
- ``multimodal`` : opaque binary columns + typed metadata; Arrow-batched
                   decode/feature plumbing with stubbed codecs
- ``hashing``    : the engine-portable 60-bit md5 hash all of the above
                   share (identical in Spark and external SQL engines, so
                   every operator stays differentially testable)
- ``sampling``   : deterministic hash-gated sampling, train/eval splits,
                   weighted corpus mixing (no RNG — the sample is a
                   reproducible artifact, and subset-stable under
                   fraction changes)
- ``udfs``       : the engine's Pandas-UDF surface (scalar + grouped-map
                   worked examples per SURVEY.md §2.10)
"""

from . import dedup, hashing, multimodal, sampling, similarity, text, udfs  # noqa: F401
