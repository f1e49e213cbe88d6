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


def _select_serial_batch(
    cand: list[tuple[str, int]], window_full: bool, max_n: int
) -> list[tuple[str, int]]:
    """From the top-T candidate window (``(pair, count)`` in (count DESC,
    pair ASC) order), pick the longest PREFIX that provably merges in
    exactly the serial learner's order when applied together — the
    batching lever that takes n_merges past toy sizes (VERDICT r3 #7)
    without changing a single output bit.

    Soundness argument (per selected prefix P1..Pk, serial step j):

    - prefix selection: every candidate ranked above P_j is selected, so
      every unselected old pair orders after P_j under (count, pair) and
      merging can only DECREASE its count (adjacency removal);
    - symbol-disjointness: P_j's own count is invariant under P1..P_{j-1};
    - created/boosted pairs: a pair created by merging P_i=(a,b) into m is
      (x,m) or (m,y) with count ≤ count(x,a) resp. count(b,y) — pairs that
      SHARE a symbol with P_i, so their counts are ≤ ``ceiling`` (if in
      the window) or ≤ ``below`` (the window floor) otherwise; if m
      collides with an existing symbol the created count additionally
      boosts that pair's old count, bounded by ``below`` when the pair is
      outside the window (m colliding with an in-window symbol stops the
      batch — select-then-stop). Requiring
      ``count(P_j) > below + max(ceiling, below)`` therefore strictly
      outranks every created/boosted pair, ties impossible.

    Zipf-shaped pair counts make the head qualify in bulk; worst case the
    batch degenerates to size 1 = the serial algorithm.
    """
    below = cand[-1][1] if window_full else 0
    window_symbols = {s for p, _ in cand for s in p.split(" ")}
    selected: list[tuple[str, int]] = []
    sel_symbols: set[str] = set()
    merged_strs: set[str] = set()
    for pair, cnt in cand:
        if len(selected) >= max_n:
            break
        a, b = pair.split(" ")
        if selected:
            if a in sel_symbols or b in sel_symbols:
                break
            if a in merged_strs or b in merged_strs:
                break
            ceiling = max(
                (
                    c2
                    for p2, c2 in cand
                    if p2 not in {p for p, _ in selected}
                    and (set(p2.split(" ")) & sel_symbols)
                ),
                default=0,
            )
            if cnt <= below + max(ceiling, below):
                break
        selected.append((pair, cnt))
        sel_symbols.update((a, b))
        merged_strs.add(a + b)
        if a + b in window_symbols:
            break  # created symbol collides with a live symbol: stop batch
    return selected


def bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 4,
    batch_candidates: int = 128,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns the merge
    table (merge_rank, pair, merged, pair_count) — the artifact a tokenizer
    ships. Symbols start as single characters of the lowercased a-z word
    tokens (the repo-standard tokenizer).

    Scale shape (VERDICT r3 #7): instead of one driver round-trip and one
    more ``_merge_pair`` expression layer PER MERGE, each round fetches the
    top ``batch_candidates`` pairs (bounded driver traffic) and applies the
    longest provably serial-equivalent prefix in one pass
    (:func:`_select_serial_batch` — bit-identical output to the serial
    loop, pinned by the property suite at n_merges=50), then cuts lineage
    with an eager ``localCheckpoint`` so the expression chain never deepens
    past one batch. n_merges=64 runs in a handful of rounds.
    """
    from map_reduce_group_spark.operators.text import spread_small_scan, tokens

    spark = docs.sparkSession
    words = (
        spread_small_scan(docs.select(col(text_col).alias("_text")))
        .select(F.explode(tokens("_text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    # "h e l l o" symbol representation; localCheckpoint — every round
    # starts from materialized vocab-sized blocks with no lineage behind
    spaced = words.select(
        F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("s"), "wc"
    ).localCheckpoint()
    ckpt = spaced  # last materialized frame (unpersisted on the next cut)
    pending = 0  # merges applied since that cut

    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges:
        cand_rows = (
            spaced.select(
                F.explode(
                    F.regexp_extract_all("s", F.lit(_PAIR_RE), 1)
                ).alias("pair"),
                "wc",
            )
            .groupBy("pair")
            .agg(F.sum("wc").cast("long").alias("pair_count"))
            .orderBy(col("pair_count").desc(), "pair")
            .limit(batch_candidates)
            .collect()
        )
        if not cand_rows:  # vocab fully merged: no pairs left
            break
        cand = [(r["pair"], r["pair_count"]) for r in cand_rows]
        batch = _select_serial_batch(
            cand, window_full=len(cand) == batch_candidates,
            max_n=n_merges - len(merges),
        )
        s = col("s")
        for pair, cnt in batch:
            merges.append((len(merges) + 1, pair, pair.replace(" ", ""), cnt))
            s = _merge_pair(s, pair)
        spaced = spaced.select(s.alias("s"), "wc")
        pending += len(batch)
        # cut lineage every ~8 APPLIED merges, not every round: each
        # localCheckpoint is a full materialization job, and the serial-
        # equivalence batches run 1-3 merges/round on real text (the head
        # pairs share letters), so per-round cuts spent a job per ~2
        # merges. A ≤8-deep regexp_replace chain re-evaluates inside the
        # next round's aggregation stage for far less than a job costs
        # (guide §1.2: fix the pass count before the per-task work).
        if pending >= 8:
            old = ckpt
            ckpt = spaced = spaced.localCheckpoint()
            old.unpersist()
            pending = 0
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
    from map_reduce_group_spark.operators.text import spread_small_scan, tokens

    merges = [
        r["pair"]
        for r in bpe_merges(docs, text_col, n_merges)
        .orderBy("merge_rank")
        .collect()
    ]
    doc_words = spread_small_scan(
        docs.select(col(id_col).alias("id"), col(text_col).alias("_text"))
    ).select("id", F.explode(tokens("_text")).alias("word"))
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
