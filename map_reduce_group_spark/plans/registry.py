"""Query registry: the single source of truth for the engine's query surface.

Every operator/capability from SURVEY §2 that we implement registers here as
a named query:

- ``builder(spark, sf_dir) -> DataFrame`` — the PySpark-native implementation;
- ``oracle`` — equivalent ANSI SQL for the DuckDB oracle (None for queries
  whose semantics are not SQL-expressible; the driver then records a weaker
  rows-only check).

``__spark_entry__.queries()`` / ``oracle_sql()`` are direct views over this
registry. Column names are aliased identically on both sides because the
driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn`` as query ``name`` with optional oracle SQL."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
            # determinism confs (time zone etc.) regardless of session origin
            from map_reduce_group_spark.session import apply_runtime_confs

            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        guarded.__name__ = fn.__name__
        guarded.__doc__ = fn.__doc__
        guarded.__module__ = fn.__module__
        guarded.__wrapped__ = fn  # tools/audit_staleness.py resolves source through this
        REGISTRY[name] = QuerySpec(name=name, builder=guarded, oracle=oracle, doc=fn.__doc__ or "")
        return guarded

    return wrap


# Approximate sf0.1 wall seconds (BENCH.json) for queries that are materially
# slower than the ~0.3-1 s norm; plans/__init__._reorder_registry uses this as
# a secondary sort key so a time-budgeted driver sweep gets through the cheap
# tail before committing to the heavy queries.
COST_HINT = {
    "agg_approx_sketches": 1.6, "agg_cube_returns": 1.8, "agg_distinct_counts": 1.2,
    "agg_stats_exact": 1.4, "corpus_contamination_check": 3.7, "corpus_duplicated_spans": 3.2,
    "corpus_span_cut": 3.1, "text_topk_bigrams_by_lang": 0.9, "graph_triangle_census": 8.0,
    "agg_mad_outliers": 1.5,
    "corpus_importance_resample": 3.0,
    "diag_join_key_skew": 4.5,
    "doc_quality_classifier": 2.7,
    "corpus_filter_agreement": 8.0,
    "embed_ann_pq_adc": 1.3,
    "embed_matryoshka_agreement": 1.2,
    "stream_late_quarantine": 4.0,
    "text_bm25_topk": 2.0,
    "corpus_mixture_rebalance": 1.1, "corpus_sequence_pack": 3.1, "corpus_span_dedup": 1.4,
    "dedup_clusters": 6.7, "dedup_jaccard_prefix": 5.0, "dedup_jaccard_topmatch": 5.5,
    "dedup_minhash_lsh": 3.2, "dedup_minhash_lsh_capped": 3.2, "doc_bpe_merges64": 4.5,
    "dedup_ngram_jaccard": 1.9, "dedup_suffix_longest_span": 6.0,
    "dedup_incremental_minhash": 6.6,
    "stream_incremental_minhash": 8.0,
    "stream_hll_cardinality": 2.0,
    "dedup_ngram_jaccard_capped": 3.3, "dedup_simhash": 3.3, "doc_bpe_merges": 1.9,
    "doc_ngram_novelty": 2.2, "text_source_bigram_overlap": 1.9, "embed_rank_fusion": 1.6,
    "agg_winsorized_revenue": 2.1, "multimodal_bmp_ahash_groups": 2.6,
    "stream_cms_cells": 3.0, "doc_bigram_surprisal": 2.2, "market_basket_lift": 3.3,
    "orders_pareto_share": 1.5,
    "doc_bpe_token_count": 2.7, "doc_repetition_signals": 1.2, "doc_winnow_fingerprints": 1.2,
    "embed_ann_ivf_quantized": 1.4, "embed_ann_ivf_trained": 1.4,
    "embed_quantized_topk_agreement": 1.8, "embed_semdedup_prune": 1.2,
    "events_ohlc_resample": 1.1, "graph_pagerank_simgraph": 5.5, "mr_wordcount_pipe": 2.0,
    "multimodal_bmp_decode": 1.0, "multimodal_video_frame_sample": 2.1, "multimodal_wav_decode": 1.1,
    "multimodal_wav_frame_energy": 1.2, "pipeline_corpus_prep": 7.8, "pipeline_corpus_prep_v2": 3.1,
    "q11_important_stock": 1.1, "q18_large_volume_customers": 1.7, "q1_pricing_summary": 1.1,
    "q20_excess_suppliers": 1.1, "q21_waiting_suppliers": 2.3, "q2_min_cost_supplier": 1.9,
    "q8_market_share": 1.1, "q9_product_profit": 1.2, "source_synthetic_docs": 4.0,
    "stream_dedup_redelivery": 3.5, "stream_purchase_attribution": 7.3, "stream_running_totals": 3.5,
    "stream_sessionization": 2.7, "stream_static_enrich": 1.2, "stream_synthetic_source": 3.1,
    "stream_tumbling_hourly": 1.4, "text_tfidf_top_terms": 1.2, "udf_cogroup_in_pandas": 3.4,
}


def queries() -> dict[str, Builder]:
    import map_reduce_group_spark.plans  # noqa: F401  (populates + orders REGISTRY)

    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracles() -> dict[str, str]:
    import map_reduce_group_spark.plans  # noqa: F401

    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
