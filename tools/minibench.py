#!/usr/bin/env python3
"""Mini-bench for optimization A/Bs: run a named subset of registered
queries exactly as bench.py does (fresh session, uniform-warm prescan, noop
sink, cache cleared between queries) and print one JSON line. Extra confs
come from $SPARK_GRAFT_EXTRA_CONFS ("k=v;k=v") applied AFTER session build,
so runtime-settable knobs can be A/B'd in isolation while the session keeps
bench defaults. Subset defaults to the heavy head (wall >= ~2.5 s in the
round-9 baseline BENCH.json) — the part of the artifact where config effects
rise above the per-query noise floor.

Usage: python tools/minibench.py [name,name,... | TOPN]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_TOP = [
    "dedup_jaccard_prefix", "corpus_filter_agreement", "dedup_incremental_minhash",
    "dedup_jaccard_topmatch", "graph_triangle_census", "dedup_suffix_longest_span",
    "stream_incremental_minhash", "stream_purchase_attribution_outer",
    "pipeline_corpus_prep", "doc_bpe_merges64", "graph_pagerank_simgraph",
    "dedup_clusters", "diag_join_key_skew", "udf_cogroup_in_pandas",
    "embed_semdedup_prune", "corpus_contamination_check", "dedup_incremental_exact",
    "stream_late_quarantine", "dedup_simhash", "dedup_ngram_jaccard_capped",
    "dedup_containment", "corpus_span_cut", "doc_quality_classifier",
    "stream_purchase_attribution", "source_synthetic_docs", "dedup_minhash_lsh_capped",
    "corpus_importance_resample", "market_basket_lift", "agg_winsorized_revenue",
    "dedup_ngram_jaccard", "corpus_duplicated_spans", "pipeline_corpus_prep_v2",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = DEFAULT_TOP
    if len(sys.argv) > 1 and sys.argv[1] != "TOP":
        names = sys.argv[1].split(",")

    from map_reduce_group_spark.plans import queries
    from map_reduce_group_spark.session import get_session

    spark = get_session("mrg-minibench")
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONFS", "")
    confs = {}
    if extra:
        for kv in extra.split(";"):
            k, v = kv.split("=", 1)
            spark.conf.set(k, v)
            confs[k] = v

    qs = queries()
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    from map_reduce_group_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
        for k, v in confs.items():
            spark.conf.set(k, v)  # re-apply: registry wrapper resets RUNTIME_CONFS keys

    print(json.dumps({
        "total": round(sum(timings.values()), 2),
        "queries": timings,
        "confs": confs,
        "load1m": round(os.getloadavg()[0], 2),
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
