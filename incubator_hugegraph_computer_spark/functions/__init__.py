from incubator_hugegraph_computer_spark.functions.text import (  # noqa: F401
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from incubator_hugegraph_computer_spark.functions.dedup import (  # noqa: F401
    exact_duplicates,
    minhash_candidates,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from incubator_hugegraph_computer_spark.functions.similarity import (  # noqa: F401
    cosine_topk,
    embedding_near_duplicates,
    lsh_buckets,
)
