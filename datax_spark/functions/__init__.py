"""Column-function library: text analysis, dedup families, similarity.

These are the training-data-pipeline operators layered on top of the CDC
core — everything is built-in `pyspark.sql.functions` expressions (JVM
whole-stage codegen) unless a docstring says otherwise. The shared hash
family (`h32`) is md5-based so the DuckDB oracle can reproduce every
value bit-for-bit.
"""

from datax_spark.functions.text import (  # noqa: F401
    tokens,
    token_count_ws,
    token_count_bpe,
    normalize_text,
    fingerprint,
    shingles,
    lang_scores,
    lang_predict,
    quality_metrics,
)
from datax_spark.functions.dedup import (  # noqa: F401
    exact_dup_clusters,
    minhash_signature,
    lsh_candidate_pairs,
    neardup_clusters,
    simhash16,
    ngram_jaccard_pairs,
    embedding_neardup_pairs,
)
from datax_spark.functions.similarity import (  # noqa: F401
    cosine,
    brute_force_topk,
    sign_bucket,
    ivf_topk,
)
