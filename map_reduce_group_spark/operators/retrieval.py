"""Lexical retrieval: Okapi BM25 top-k scoring in exact integer fixed point.

BM25 (Robertson et al., TREC-3) is the standard lexical ranking function —
the baseline half of every hybrid retrieval stack (the dense half is
operators/similarity.py). Scoring here follows Okapi BM25 with k1 = 1.2 and
b = 0.75 folded into exact integer arithmetic, and the log idf replaced by
the Robertson odds ratio (N − df + 1)/(df + 1) in 1/1024 fixed point — the
same log-free-surrogate convention as operators/text.py:unigram_rarity
(rule-1 exactness: a float log can differ in the last ulp between libm and
the JVM; the odds ratio preserves the idf ordering exactly).

Term-frequency normalization is exact by clearing denominators: with
k1 = 6/5, b = 3/4 and avgdl = T/N (T = total corpus tokens, N = docs with
at least one token),

    tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl·N/T)
      = 22·tf·T / (10·tf·T + 3·T + 9·dl·N)        (multiply through by 10·T)

— computed in DECIMAL(38,0) (== DuckDB HUGEINT), because the scaled
numerator 22·tf·T·1024 would wrap int64 already at tf·T ≈ 4.1·10^14
(2^63 / (22·1024)) — e.g. tf = 100 against a 4·10^12-token corpus, far
inside the advertised 100 TB envelope; non-ANSI Spark wraps silently while
DuckDB errors, so int64 would break the bit-identical-across-engines
guarantee exactly at scale (ADVICE r7 #1). The idf·tfnorm product is
widened the same way. Each term's contribution is
(idf_fp · tfnorm_fp) div 1024, floored per term BEFORE summing, so every
score is bit-identical across engines.

Scale shape: tokenization is map-side codegen; the corpus collapses to
(id, tok, tf) with one shuffle and is materialized once via an eager
localCheckpoint — reused for doc lengths, document frequencies, and
scoring, and (unlike persist-without-unpersist) the blocks are released by
the ContextCleaner when the returned plan is dropped, so repeated builder
invocations in one session do not accumulate cached blocks (ADVICE r7 #4).
Query terms ride a broadcast (selected via orderBy().limit() →
TakeOrderedAndProject, never a global window over the vocabulary); corpus
totals ride a one-row broadcast; the final top-k is a query_id-partitioned
row_number (WindowGroupLimit). Raw text never shuffles.

Fault-tolerance trade (ADVICE r8 #3): localCheckpoint truncates lineage —
a lost executor/block makes the checkpointed frame unrecoverable, where
persist would recompute from lineage — and runs a job eagerly at
plan-build time. That is the right trade for the driver/bench harness
this registry serves (no lineage leak, bounded memory); a long-lived
production cluster that must survive executor loss should swap in
persist(StorageLevel.*_2) + an explicit unpersist teardown hook instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from map_reduce_group_spark.operators.text import tokens


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    skip_top: int = 10,
    n_queries: int = 4,
    terms_per_query: int = 2,
    top_k: int = 10,
) -> DataFrame:
    """Rank documents by BM25 against ``n_queries`` self-derived queries.

    Queries are built from the corpus itself so the operator needs no
    external input: vocabulary terms ranked ``skip_top+1 ..
    skip_top+n_queries*terms_per_query`` by document frequency (ties broken
    by token — a total order) are grouped ``terms_per_query`` at a time into
    consecutive queries. Rank-based selection is data-size-relative
    (CLAUDE.md rule 7): replicating the corpus scales every df uniformly
    and selects the same terms.

    Returns (query_id, doc_id, rank, score_fp, n_terms_hit) — the top
    ``top_k`` docs per query by (score_fp DESC, doc_id). score_fp is the
    exact 1/1024 fixed-point BM25 score described in the module docstring.
    """
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok"))
        .groupBy("id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    dl = tf.groupBy("id").agg(F.sum("tf").cast("long").alias("dl"))
    vocab = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("df_t"))
    tot = dl.agg(
        F.sum("dl").cast("long").alias("t_tot"), F.count(F.lit(1)).alias("n_docs")
    )

    n_sel = skip_top + n_queries * terms_per_query
    sel = vocab.orderBy(F.desc("df_t"), "tok").limit(n_sel)
    # row_number over the ≤ n_sel-row limit frame — bounded, never the
    # full vocabulary
    r = F.row_number().over(Window.orderBy(F.desc("df_t"), "tok"))
    qterms = (
        sel.withColumn("r", r)
        .where(F.col("r") > skip_top)
        .select(
            "tok",
            "df_t",
            F.expr(f"CAST((r - {skip_top + 1}) div {terms_per_query} AS BIGINT)").alias(
                "query_id"
            ),
        )
    )

    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .join(dl, "id")
        .crossJoin(F.broadcast(tot))
        .withColumn("idf_fp", F.expr("((n_docs - df_t + 1) * 1024) div (df_t + 1)"))
        .withColumn(
            "tfnorm_fp",
            # DECIMAL(38,0), not int64: see module docstring (the scaled
            # numerator wraps int64 at tf·T ≈ 4.1e14). div on decimals
            # returns BIGINT, and tfnorm ≤ 2.2·1024 always fits.
            F.expr(
                "(CAST(tf AS DECIMAL(38,0)) * 22 * t_tot * 1024)"
                " div (CAST(10 AS DECIMAL(38,0)) * tf * t_tot"
                "      + CAST(3 AS DECIMAL(38,0)) * t_tot"
                "      + CAST(9 AS DECIMAL(38,0)) * dl * n_docs)"
            ),
        )
        .groupBy("query_id", "id")
        .agg(
            F.sum(F.expr("(CAST(idf_fp AS DECIMAL(38,0)) * tfnorm_fp) div 1024"))
            .cast("long").alias("score_fp"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )

    rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("score_fp"), "id")
    )
    return (
        scored.withColumn("rank", rank)
        .where(F.col("rank") <= top_k)
        .select(
            "query_id",
            F.col("id").alias("doc_id"),
            F.col("rank").cast("long").alias("rank"),
            "score_fp",
            "n_terms_hit",
        )
    )
