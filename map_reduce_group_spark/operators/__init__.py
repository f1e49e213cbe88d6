"""Reusable operator library (the engine's public operator API).

Each module is independently importable; the registered queries in
``map_reduce_group_spark.plans`` are thin bindings of these operators to
the fixture tables.
"""

from map_reduce_group_spark.operators.asof import asof_join
from map_reduce_group_spark.operators.clusters import connected_components
from map_reduce_group_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from map_reduce_group_spark.operators.similarity import (
    cosine_neardup_pairs,
    cosine_topk,
    ivf_topk,
)
from map_reduce_group_spark.operators.text import (
    bpe_ish_token_count,
    chunk_documents,
    fingerprint,
    predicted_lang,
    token_count,
    tokens,
)

__all__ = [
    "asof_join",
    "bpe_ish_token_count",
    "chunk_documents",
    "connected_components",
    "cosine_neardup_pairs",
    "cosine_topk",
    "exact_dedup_groups",
    "fingerprint",
    "ivf_topk",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "predicted_lang",
    "simhash",
    "simhash_near_pairs",
    "token_count",
    "tokens",
]
