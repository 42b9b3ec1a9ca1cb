"""LLM training-data pipeline operators (first-class, beyond the reference's
own surface): deduplication, similarity search, text analysis, multimodal
column plumbing. All deterministic (md5-derived hashing) so results are
reproducible and oracle-checkable across engines.
"""

from feldera_spark.datapipe.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from feldera_spark.datapipe.similarity import (  # noqa: F401
    cosine_topk,
    hyperplane_lsh_buckets,
)
from feldera_spark.datapipe.text import (  # noqa: F401
    fingerprint,
    language_id,
    quality_score,
    token_stats,
)
