"""Distributed BPE-merge learning — tokenizer training as a Spark job.

Byte-pair encoding (Sennrich et al. 2016) learns a subword vocabulary by
repeatedly merging the most frequent adjacent symbol pair. The classic
implementation is a single-machine loop over a word-frequency dict; the
100 TB shape here exploits the same compression it does:

1. ONE corpus-sized aggregation up front: tokenize and reduce to the
   DISTINCT-WORD frequency table (vocab ≪ corpus — the only pass whose
   cost scales with the data);
2. each merge iteration then runs on the compact vocab table only:
   overlapping symbol pairs are extracted with a boundary-anchored
   lookahead regex (``(?:^|(?<= ))(?=(\\S+ \\S+))`` — zero-width match at
   SYMBOL starts only, so multi-char symbols never contribute bogus
   mid-symbol pairs; codegen JVM path, no interpreted per-element lambdas,
   no Python), weighted by word frequency, and reduced to the argmax
   pair — one vocab-sized aggregation per iteration;
3. the winning pair (a scalar — the ONLY driver traffic per round, same
   O(1) class as the connected-components convergence check) is applied
   with a boundary-guarded literal replace: double the separators
   (``' a  b '`` can only match WHOLE symbols a,b — a trailing fragment
   like the ``h`` of ``th`` has no space on its left), literal-replace the
   doubled pair, collapse back.  Literal ``replace`` is left-to-right
   non-overlapping in both engines (the reference BPE merge semantics,
   Sennrich et al. 2016 guard merges with ``(?<!\\S)…(?!\\S)`` — RE2/DuckDB
   has no lookbehind, the doubling trick is the engine-neutral equivalent).

Determinism: ties break (count DESC, pair ASC) — byte-identical merge
tables on any engine and any partitioning, which is what makes the
unrolled-CTE DuckDB oracle possible (plans/llm.py:doc_bpe_merges).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import col

_PAIR_RE = r"(?:^|(?<= ))(?=(\S+ \S+))"


def _merge_pair(s, pair: str):
    """Boundary-guarded merge of ``pair`` ("a b") everywhere it occurs as
    ADJACENT WHOLE SYMBOLS in the single-spaced symbol string ``s``.

    Doubling the separators gives every symbol a private space on each
    side, so the literal pattern ``' a  b '`` cannot match a symbol
    fragment ('h e' no longer fires inside 'th e'), and consecutive
    occurrences ('c a b a b c') still all merge because neighbouring
    matches never share a space. Literal replace (not regexp) so the
    DuckDB oracle replays the byte-identical operation."""
    merged = pair.replace(" ", "")
    doubled = F.concat(F.lit(" "), F.replace(s, F.lit(" "), F.lit("  ")), F.lit(" "))
    applied = F.replace(
        doubled,
        F.lit(" " + pair.replace(" ", "  ") + " "),
        F.lit(" " + merged + " "),
    )
    return F.trim(F.replace(applied, F.lit("  "), F.lit(" ")))


def bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table (merge_rank, pair, merged, pair_count) — the artifact a tokenizer
    ships. Symbols start as single characters of the lowercased a-z word
    tokens (the repo-standard tokenizer)."""
    from map_reduce_group_spark.operators.text import tokens

    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    # "h e l l o" symbol representation; cache — every iteration starts here
    spaced = words.select(
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("s"), "wc"
    ).cache()

    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, n_merges + 1):
        rows = (
            spaced.select(
                F.explode(
                    F.regexp_extract_all("s", F.lit(_PAIR_RE), 1)
                ).alias("pair"),
                "wc",
            )
            .groupBy("pair")
            .agg(F.sum("wc").cast("long").alias("pair_count"))
            .orderBy(col("pair_count").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not rows:  # vocab fully merged / single-symbol words: no pairs left
            break
        best = rows[0]
        pair, merged = best["pair"], best["pair"].replace(" ", "")
        merges.append((k, pair, merged, best["pair_count"]))
        # boundary-guarded whole-symbol merge; map-only, so the k-step
        # lineage stays a single narrow stage over the cache
        spaced = spaced.select(_merge_pair(col("s"), pair).alias("s"), "wc")
    return spark.createDataFrame(
        merges, "merge_rank bigint, pair string, merged string, pair_count bigint"
    )


def bpe_token_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 4,
) -> DataFrame:
    """APPLY side of BPE: learn ``n_merges`` merges, segment every word
    under that vocabulary, and return per-document subword counts —
    the token-budget accounting a training pipeline runs before packing
    (sequence lengths under the REAL tokenizer, not a whitespace proxy).

    Scale shape: segmentation happens on the DISTINCT-word table (the merge
    chain is a map-only sequence of literal replaces on the space-joined
    form), then one join maps (doc, word, occurrences) through the
    word → n_subwords table and a groupBy sums per document. The corpus is
    tokenized once; everything vocabulary-sized stays vocabulary-sized.

    Returns (id, n_words, n_subwords): whitespace tokens vs BPE subwords —
    the compression the learned merges bought."""
    from map_reduce_group_spark.operators.text import tokens

    merges = [
        r["pair"]
        for r in bpe_merges(docs, text_col, n_merges)
        .orderBy("merge_rank")
        .collect()
    ]
    doc_words = docs.select(
        col(id_col).alias("id"), F.explode(tokens(text_col)).alias("word")
    )
    word_counts = doc_words.groupBy("id", "word").agg(
        F.count(F.lit(1)).alias("occ")
    )
    seg = F.trim(F.regexp_replace("word", "(.)", "$1 "))
    for pair in merges:
        seg = _merge_pair(seg, pair)
    vocab = (
        word_counts.select("word")
        .distinct()
        .withColumn("n_sub", F.size(F.split(seg, " ")).cast("long"))
    )
    return (
        word_counts.join(vocab, "word")
        .groupBy("id")
        .agg(
            F.sum("occ").cast("long").alias("n_words"),
            F.sum(col("occ") * col("n_sub")).cast("long").alias("n_subwords"),
        )
    )
