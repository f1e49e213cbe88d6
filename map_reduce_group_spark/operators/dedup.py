"""Deduplication operators (north-star, BASELINE.json): exact, n-gram
Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:

- **exact**: group by a 16-byte fingerprint (md5), never by the raw text —
  shuffle volume is keys+ids only.
- **n-gram Jaccard**: inverted-index self-join on shingles (only documents
  sharing ≥1 shingle ever meet — exact, no O(n²)); at extreme scale add
  prefix filtering / df-cap on hot shingles (noted inline).
- **MinHash+LSH**: fixed-size signatures (k hashes) → banding → bucket
  join; candidate verification by exact Jaccard over the shingle postings.
- **SimHash**: 64-bit signature via per-bit weighted sums — one explode +
  one groupBy.

Performance note (measured, sf0.1): everything here deliberately avoids
Spark's higher-order array functions (transform/aggregate lambdas are
*interpreted* per element — a nested-transform MinHash measured ~60 ms/doc).
Shingles are built with posexplode + window ``lead`` and signatures with
flat ``min(xxhash64(...))`` aggregates, all inside whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import col

from map_reduce_group_spark.functions.numeric import fp_ratio
from map_reduce_group_spark.operators.text import (
    fingerprint,
    spread_small_scan,
    tokens,
)


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact-duplicate groups by normalized-text fingerprint.

    Returns (fingerprint, rep_id = min id, n_copies). Canonical
    representative selection is min(id) — deterministic.
    """
    return (
        df.select(col(id_col).alias("id"), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("id").alias("rep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def incremental_exact_dedup(
    batch: DataFrame,
    state_path: str,
    id_col: str,
    text_col: str,
    part_chars: int = 1,
) -> DataFrame:
    """Dedup a NEW batch against the historical corpus WITHOUT rescanning it
    — the operator a continuously-ingesting 100 TB pipeline actually runs
    (VERDICT r3 #8): corpus-scale work happened once, historically; each
    increment touches state proportional to ITS OWN fingerprints.

    State is a parquet table at ``state_path`` — (part, fingerprint,
    rep_id), partitioned by a prefix of the fingerprint's hex digest
    (``part_chars``: 1 hex char = 16 partitions for fixture scale, 2 = 256
    for a real corpus; a pure function of the key, the upsert_by_key
    contract). Per batch:

    1. fingerprint the batch (16-byte md5 of normalized text — never raw
       text in the shuffle);
    2. probe ONLY the state partitions the batch's fingerprints land in
       (partition-pruned scan + broadcast of the batch's distinct
       fingerprints — the increment is small by premise);
    3. decide: a fingerprint already in state keeps the HISTORICAL rep_id
       (first-seen-wins — deliberately different from batch dedup's global
       min, and what makes dedup decisions stable as the corpus grows);
       a new fingerprint elects min(batch id);
    4. append the new fingerprints to state (dynamic partition overwrite of
       affected partitions only).

    Decisions are materialized to parquet under the state dir BEFORE the
    state update (step 4 would otherwise change a lazy step-3 plan), so the
    returned DataFrame is stable however it is re-read. Replay-idempotent:
    re-ingesting the same batch finds every fingerprint in state, changes
    nothing, and reports zero first_seen rows.

    Returns (id, fingerprint, rep_id, first_seen).
    """
    import os

    from map_reduce_group_spark.operators.incremental import upsert_by_key

    spark = batch.sparkSession
    fps = batch.select(
        col(id_col).alias("id"), fingerprint(text_col).alias("fingerprint")
    )
    batch_reps = fps.groupBy("fingerprint").agg(F.min("id").alias("batch_rep"))

    table = os.path.join(state_path, "fingerprints")
    if os.path.exists(table):
        parts = [
            r["part"]
            for r in batch_reps.select(
                F.substring("fingerprint", 1, part_chars).alias("part")
            ).distinct().collect()
        ]
        known = (
            spark.read.parquet(table)
            .filter(col("part").isin(parts))
            .join(
                F.broadcast(batch_reps.select("fingerprint").distinct()),
                "fingerprint",
            )
            .select("fingerprint", col("rep_id").alias("state_rep"))
        )
    else:
        known = spark.createDataFrame([], "fingerprint string, state_rep bigint")

    decisions = (
        fps.join(F.broadcast(batch_reps), "fingerprint")
        .join(F.broadcast(known), "fingerprint", "left")
        .select(
            "id",
            "fingerprint",
            F.coalesce(col("state_rep"), col("batch_rep")).alias("rep_id"),
            (
                col("state_rep").isNull() & (col("id") == col("batch_rep"))
            ).alias("first_seen"),
        )
    )
    n_prev = (
        len([d for d in os.listdir(state_path) if d.startswith("decisions_")])
        if os.path.exists(state_path)
        else 0
    )
    out_dir = os.path.join(state_path, f"decisions_{n_prev}")
    decisions.write.mode("overwrite").parquet(out_dir)
    decided = spark.read.parquet(out_dir)

    new_fps = decided.filter(col("first_seen")).select(
        F.substring("fingerprint", 1, part_chars).alias("part"),
        "fingerprint",
        col("rep_id"),
    )
    if os.path.exists(table):
        upsert_by_key(new_fps, table, ["fingerprint"], "part")
    else:
        # 16**part_chars = the table's partition-value count (a layout
        # constant): sizing the clustering shuffle to it writes one file
        # per partition dir instead of shuffle.partitions-many tasks each
        # paying the per-file create/commit latency (guide §6)
        new_fps.repartition(16**part_chars, col("part")).write.partitionBy(
            "part"
        ).parquet(table)
    return decided


def shingle_postings(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word-n-gram postings: (id, shingle, set_size).

    posexplode tokens → window ``lead`` to assemble each n-gram → distinct.
    One shuffle (by id, for the lead window); the distinct and the set-size
    window reuse that same hash partitioning, so Catalyst plans no further
    exchange. Documents with fewer than ``n`` tokens yield no postings.
    The (id, text) projection is spread across the session first
    (:func:`~map_reduce_group_spark.operators.text.spread_small_scan`) so a
    single-row-group input cannot serialize the tokenize head.
    """
    base = spread_small_scan(
        df.select(col(id_col).alias("id"), col(text_col).alias("_text"))
    )
    t = base.select("id", F.posexplode(tokens("_text")).alias("pos", "tok"))
    w = Window.partitionBy("id").orderBy("pos")
    parts = [col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    postings = (
        t.select(
            "id",
            F.concat_ws(" ", *parts).alias("shingle"),
            F.lead("tok", n - 1).over(w).alias("_last"),
        )
        .filter(col("_last").isNotNull())  # incomplete tail n-grams
        .select("id", "shingle")
        .distinct()
    )
    return postings.withColumn("set_size", F.count(F.lit(1)).over(Window.partitionBy("id")))


#: Minimum fraction of exact-text-clone documents before the identical-set
#: collapse engages (data-size-relative, CLAUDE.md rule 7 — never absolute).
COLLAPSE_MIN_CLONE_FRAC = 0.01


def _worth_collapsing(df: DataFrame, text_col: str) -> bool:
    """Cheap pre-check gating the identical-set collapse (VERDICT r4 #5):
    the collapse machinery (collect_list set fingerprints + expansion
    joins) costs a fixed ~2-6 s per query at sf0.1 but only pays when
    exact-clone families exist. Identical TEXT is the dominant — and
    cheap-to-count — source of identical shingle sets, so collapse only
    when more than :data:`COLLAPSE_MIN_CLONE_FRAC` of documents are exact
    text clones: one count/count_distinct(md5) aggregate, false on the
    organic sf fixtures (0-8 clones), decisively true on replicated scale
    fixtures (≥90%). Either path returns VALUE-IDENTICAL results —
    identical shingle sets have identical signatures, band buckets,
    prefixes, and verified Jaccard — so oracles are unaffected.

    NULL texts are excluded from BOTH sides of the fraction (ADVICE r5:
    count(*) included them while count_distinct(md5) didn't, so a corpus
    with ≥1% NULL texts engaged the collapse with zero clone families —
    pure overhead, results unchanged either way)."""
    n, d = df.agg(
        F.count(col(text_col)), F.count_distinct(F.md5(col(text_col)))
    ).first()
    return n > 0 and (n - d) / n >= COLLAPSE_MIN_CLONE_FRAC


def _exact_jaccard_pairs(postings: DataFrame, threshold: float) -> DataFrame:
    """(id_a, id_b, n_common, jaccard) for every posting-sharing pair at or
    above ``threshold`` — the shared verification shape of the exact-Jaccard
    family (threshold on the RAW quotient; the displayed jaccard is 1/10^6
    integer fixed point — functions/numeric.py:fp_ratio, rule 1)."""
    a = postings.select(col("id").alias("id_a"), col("set_size").alias("size_a"), "shingle")
    b = postings.select(col("id").alias("id_b"), col("set_size").alias("size_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .withColumn(
            "jaccard_raw", col("n_common") / (col("size_a") + col("size_b") - col("n_common"))
        )
        .filter(col("jaccard_raw") >= threshold)
        .select(
            "id_a",
            "id_b",
            "n_common",
            fp_ratio("n_common", "size_a + size_b - n_common").alias("jaccard"),
        )
    )


def _collapsed_pair_structure(postings: DataFrame, threshold: float):
    """Identical-set collapse shared by the exact-Jaccard family (same lemma
    as jaccard_prefix_filter_pairs: byte-identical POST-CAP shingle sets
    have identical overlap with everything, so exact-clone families verify
    once through a representative — the g² clone-family blowup becomes g).
    The collapse key includes set_size: under a df-cap two docs can share
    the filtered set while differing in true set size, and set_size is the
    Jaccard denominator.

    Returns (members, rep_pairs):
    - members: (set_fp, set_size, id, rep, n_kept) — one row per document,
      ``rep`` = min(id) of its identical-set group, ``n_kept`` = size of
      the (post-cap) shingle set;
    - rep_pairs: (id_a, id_b, n_common, jaccard) — qualifying pairs at the
      REPRESENTATIVE level (cross-group only; within-group pairs are
      implicit: n_common = n_kept, jaccard = n_kept/(2·set_size − n_kept)).
    """
    from pyspark import StorageLevel

    # members is consumed by the rep-postings filter here AND by every
    # caller's expansion joins (ma/mb/m1/m2 — up to 4 more subtrees);
    # without a persist each consumer re-runs the collect_list set-
    # fingerprint aggregation AND the postings head behind it (measured:
    # the triangle-census plan held 132 copies of the documents scan,
    # zero ReusedExchange — guide §2.4 "remove shuffles outright").
    members = _identical_set_members(postings).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    rpost = postings.join(members.filter(col("id") == col("rep")).select("id"), "id")
    return members, _exact_jaccard_pairs(rpost, threshold)


def _identical_set_members(postings: DataFrame) -> DataFrame:
    """(set_fp, set_size, id, rep, n_kept) — one row per document, ``rep`` =
    min(id) of its byte-identical (post-cap) shingle-set group, ``n_kept``
    = size of the post-cap set. The collapse key includes set_size because
    under a df-cap two docs can share the filtered set while differing in
    TRUE set size, and set_size is every overlap metric's denominator.
    Shared by the Jaccard and containment collapse paths."""
    sets = postings.groupBy("id", "set_size").agg(
        F.md5(F.concat_ws("\x1f", F.array_sort(F.collect_list("shingle")))).alias(
            "set_fp"
        ),
        F.count(F.lit(1)).alias("n_kept"),
    )
    reps = sets.groupBy("set_fp", "set_size").agg(F.min("id").alias("rep"))
    return sets.join(reps, ["set_fp", "set_size"]).select(
        "set_fp", "set_size", "id", "rep", "n_kept"
    )


def capped_postings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_doc_freq: int | None = None,
    max_doc_frac: float | None = None,
) -> DataFrame:
    """Shingle postings with the optional df-cap applied — the shared input
    of the exact-Jaccard family. df is computed on the FULL postings (the
    contract counts every document) before any collapse downstream."""
    if max_doc_freq is not None and max_doc_frac is not None:
        raise ValueError("pass max_doc_freq or max_doc_frac, not both")
    postings = shingle_postings(df, id_col, text_col, n)
    if max_doc_frac is not None:
        n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
        w_df = Window.partitionBy("shingle")
        postings = (
            postings.crossJoin(F.broadcast(n_docs))
            .withColumn("df", F.count(F.lit(1)).over(w_df))
            .filter(
                col("df")
                <= F.greatest(F.ceil(F.lit(max_doc_frac) * col("n_docs")), F.lit(1))
            )
            .drop("df", "n_docs")
        )
    elif max_doc_freq is not None:
        w_df = Window.partitionBy("shingle")
        postings = (
            postings.withColumn("df", F.count(F.lit(1)).over(w_df))
            .filter(col("df") <= max_doc_freq)
            .drop("df")
        )
    return postings


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
    max_doc_freq: int | None = None,
    max_doc_frac: float | None = None,
) -> DataFrame:
    """EXACT n-gram-Jaccard similar pairs via inverted-index self-join.

    Pipeline: doc → distinct shingle postings → self-join on shingle
    (id_a < id_b) → count shared shingles per pair → Jaccard =
    |∩| / (|A|+|B|-|∩|) → threshold.

    Exact because any pair with Jaccard > 0 shares ≥1 shingle and is
    therefore generated. Scale levers (100 TB): cap posting-list length for
    stop-shingles (a shingle in >f docs contributes candidates quadratically
    — with threshold t a pair sharing only ultra-common shingles can't pass
    anyway), and a length-ratio prefilter size_a/size_b ≥ t.

    The threshold is applied to the RAW quotient (matches the oracle);
    the displayed value is 1/10^6 integer fixed point (fp_ratio, rule 1).

    ``max_doc_freq`` / ``max_doc_frac`` are the 100 TB lever: drop
    stop-shingles appearing in more than that many (resp. that fraction of)
    documents BEFORE the self-join (a shingle in f docs contributes O(f²)
    candidate rows). Set sizes keep counting dropped shingles, so the
    measured overlap only shrinks: measured ≤ true Jaccard, and every
    returned pair therefore meets the threshold on the TRUE metric too
    (exact precision; recall loss limited to pairs whose overlap is mostly
    boilerplate shingles). Prefer the fractional form — boilerplate volume
    grows with the corpus while duplicate-family sizes (whose shingles have
    df ≈ family size) don't, so a fraction stays recall-safe as data grows
    where any absolute cap eventually cuts into real duplicate families.
    The effective cap is ``greatest(ceil(frac · n_docs), 1)`` computed in
    double on both engines (identical IEEE result, oracle-stable). Default
    None = fully exact (oracle mode).
    """
    from pyspark import StorageLevel

    # persist: postings feed BOTH sides of the shingle self-join (and the
    # collapse machinery when engaged); without it the tokenize→window→
    # distinct head plans twice — the plan showed 2 full documents scans
    # and zero ReusedExchange (guide §2.4)
    postings = capped_postings(
        df, id_col, text_col, n, max_doc_freq=max_doc_freq, max_doc_frac=max_doc_frac
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if not _worth_collapsing(df, text_col):
        return _exact_jaccard_pairs(postings, threshold)
    members, rep_pairs = _collapsed_pair_structure(postings, threshold)
    ma = members.select(col("rep").alias("id_a"), col("id").alias("m_a"))
    mb = members.select(col("rep").alias("id_b"), col("id").alias("m_b"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("m_a", "m_b").alias("id_a"),
            F.greatest("m_a", "m_b").alias("id_b"),
            "n_common",
            "jaccard",
        )
    )
    # within-group pairs share the whole FILTERED set (n_kept shingles);
    # under a cap their measured Jaccard n_kept/(2s-n_kept) can be < 1 and
    # must still clear the threshold, exactly as the all-pairs form computes
    m1 = members.select("set_fp", "set_size", col("id").alias("id_a"), "n_kept")
    m2 = members.select("set_fp", "set_size", col("id").alias("id_b"))
    within = (
        m1.join(m2, ["set_fp", "set_size"])
        .filter(col("id_a") < col("id_b"))
        .withColumn(
            "jaccard_raw",
            col("n_kept") / (col("set_size") * 2 - col("n_kept")),
        )
        .filter(col("jaccard_raw") >= threshold)
        .select(
            "id_a",
            "id_b",
            col("n_kept").alias("n_common"),
            fp_ratio("n_kept", "set_size * 2 - n_kept").alias("jaccard"),
        )
    )
    return cross.unionByName(within)


def jaccard_prefix_filter_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram-Jaccard pairs ≥ ``threshold`` via PREFIX FILTERING —
    sublinear candidate generation with NO recall loss.

    The third point in the exact↔scale design space (public algorithms:
    Xiao et al., WWW'08 "Efficient Similarity Joins for Near Duplicate
    Detection"; Vernica et al., SIGMOD'10 distributed set-similarity join):

    - ``ngram_jaccard_pairs`` (uncapped): exact, but every shared shingle
      generates candidates — quadratic on boilerplate.
    - ``ngram_jaccard_pairs(max_doc_frac=…)``: sublinear, exact precision,
      but recall loss on pairs whose overlap is mostly stop-shingles.
    - **this operator**: exact precision AND recall, candidates only from
      each document's *prefix* — its ``|d| − ⌈t·|d|⌉ + 1`` globally rarest
      shingles (total order = (df ASC, shingle ASC)). Prefix-filter lemma:
      two sets with Jaccard ≥ t must share at least one prefix shingle, so
      no qualifying pair is ever skipped; stop-shingles sit at the *end* of
      the order and almost never enter a prefix, so hot posting lists stop
      generating O(df²) candidate rows. At t=0.5 the prefix is ~half the
      set; the candidate join touches only rare-shingle postings.

    Plan shape (all key-partitioned shuffles, no all-pairs):

    0. **identical-set collapse** — documents with byte-identical shingle
       SETS (exact-clone families) are grouped by a set fingerprint
       (md5 of the sorted shingle list) and only one REPRESENTATIVE per
       group enters the join; results expand back afterwards (rep-pair ×
       members cross product + within-group pairs at Jaccard exactly 1).
       Provably exact — identical sets have identical Jaccard to
       everything — and load-bearing at scale: on a clone-replicated
       fixture every family of g clones otherwise multiplies candidate
       AND verification work by g² (measured 531 s → seconds at the 10×
       fixture, 31.2M candidate pairs → unique-content-sized);
    1. representative postings → df per shingle (window by shingle) →
       per-doc rank (window by id) → prefix self-join on shingle + length
       filter (t·|A| ≤ |B| ≤ |A|/t) → distinct candidate pairs → exact
       verification join against the representatives' postings (identical
       to the MinHash verifier). Verification cost is
       O(candidates · set size), driver traffic zero.

    Deliberately NOT reusing the df-cap: the two levers compose (cap first,
    prefix-filter the survivors) but here we keep the exact contract so the
    DuckDB oracle is plain all-pairs Jaccard — the pruning provably cannot
    change the answer, and the oracle verifies exactly that.
    """
    from pyspark import StorageLevel

    # persist at the head: postings feed the prefix computation, BOTH
    # verification sides, and (when the collapse engages) the set-
    # fingerprint aggregation — one tokenize head for all of them
    postings = shingle_postings(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    # 0. collapse identical shingle sets: one representative per set_fp —
    # gated by the cheap clone-fraction pre-check (VERDICT r4 #5): on a
    # clone-free corpus every doc is its own representative and the
    # fingerprint/expansion machinery is pure overhead
    collapse = _worth_collapsing(df, text_col)
    if collapse:
        sets = postings.groupBy("id", "set_size").agg(
            F.md5(F.concat_ws("\x1f", F.array_sort(F.collect_list("shingle")))).alias(
                "set_fp"
            )
        )
        reps = sets.groupBy("set_fp").agg(F.min("id").alias("rep"))
        # members expand the rep pairs back at the end (4 more consumers)
        members = (
            sets.join(reps, "set_fp")
            .select("set_fp", "id", "rep", "set_size")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        rpost = postings.join(
            members.filter(col("id") == col("rep")).select("id"), "id"
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        rpost = postings  # already persisted above

    w_df = Window.partitionBy("shingle")
    w_rank = Window.partitionBy("id").orderBy("df", "shingle")
    prefix_len = (
        col("set_size") - F.ceil(F.lit(threshold) * col("set_size")) + F.lit(1)
    )
    prefix = (
        rpost.withColumn("df", F.count(F.lit(1)).over(w_df))
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(col("rn") <= prefix_len)
        .select("id", "set_size", "shingle")
    )
    a = prefix.select(col("id").alias("id_a"), col("set_size").alias("size_a"), "shingle")
    b = prefix.select(col("id").alias("id_b"), col("set_size").alias("size_b"), "shingle")
    cand = (
        a.join(b, "shingle")
        .filter(col("id_a") < col("id_b"))
        # Jaccard ≥ t ⟹ |A∩B| ≥ t·|A∪B|, and |A∩B| ≤ min, |A∪B| ≥ max
        # ⟹ min(|A|,|B|) ≥ t·max(|A|,|B|)
        .filter(
            (col("size_b") >= F.lit(threshold) * col("size_a"))
            & (col("size_a") >= F.lit(threshold) * col("size_b"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    pa = rpost.select(col("id").alias("id_a"), col("set_size").alias("size_a"), "shingle")
    pb = rpost.select(col("id").alias("id_b"), col("set_size").alias("size_b"), "shingle")
    rep_pairs = (
        cand.join(pa, "id_a")
        .join(pb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .withColumn(
            "jaccard_raw", col("n_common") / (col("size_a") + col("size_b") - col("n_common"))
        )
        .filter(col("jaccard_raw") >= threshold)
        .select(
            "id_a",
            "id_b",
            "n_common",
            fp_ratio("n_common", "size_a + size_b - n_common").alias("jaccard"),
        )
    )
    if not collapse:
        return rep_pairs

    # expand representative pairs to all member pairs (cross-group) …
    ma = members.select(col("rep").alias("id_a"), col("id").alias("m_a"))
    mb = members.select(col("rep").alias("id_b"), col("id").alias("m_b"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("m_a", "m_b").alias("id_a"),
            F.greatest("m_a", "m_b").alias("id_b"),
            "n_common",
            "jaccard",
        )
    )
    # … plus within-group pairs: identical sets, Jaccard exactly 1
    m1 = members.select("set_fp", col("id").alias("id_a"), "set_size")
    m2 = members.select("set_fp", col("id").alias("id_b"))
    within = (
        m1.join(m2, "set_fp")
        .filter(col("id_a") < col("id_b"))
        .select(
            "id_a",
            "id_b",
            col("set_size").cast("long").alias("n_common"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(within)


def _containment_counts(postings: DataFrame) -> DataFrame:
    """Undirected (id_a < id_b) pair overlap counts carrying BOTH set sizes —
    the shared candidate aggregate that both containment directions read, so
    the posting self-join (the expensive half) runs once per pair, not twice."""
    a = postings.select(col("id").alias("id_a"), col("set_size").alias("size_a"), "shingle")
    b = postings.select(col("id").alias("id_b"), col("set_size").alias("size_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def _directional_containment(counts: DataFrame, threshold: float) -> DataFrame:
    """Expand undirected overlap counts into qualifying DIRECTIONAL rows:
    src→dst iff |src∩dst| / |src| ≥ threshold (threshold on the RAW
    quotient; the display is 1/10^6 integer fixed point — fp_ratio).

    Single-pass ``explode(array(struct…))``, not a two-branch union — the
    ``counts`` argument is the expensive posting self-join aggregate, and a
    union would plan it twice (the same double-subtree shape behind the
    jaccard_topmatch r6 bench regression)."""
    sym = counts.select(
        F.explode(
            F.array(
                F.struct(
                    col("id_a").alias("src_id"),
                    col("id_b").alias("dst_id"),
                    col("size_a").alias("src_size"),
                ),
                F.struct(
                    col("id_b").alias("src_id"),
                    col("id_a").alias("dst_id"),
                    col("size_b").alias("src_size"),
                ),
            )
        ).alias("e"),
        "n_common",
    )
    return (
        sym.filter(col("n_common") / col("e.src_size") >= threshold)
        .select(
            col("e.src_id").alias("src_id"),
            col("e.dst_id").alias("dst_id"),
            "n_common",
            fp_ratio("n_common", "e.src_size").alias("containment"),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_doc_freq: int | None = None,
    max_doc_frac: float | None = None,
) -> DataFrame:
    """DIRECTIONAL n-gram-set CONTAINMENT pairs: emit src→dst whenever
    C(src→dst) = |shingles(src) ∩ shingles(dst)| / |shingles(src)| ≥
    ``threshold``.

    Containment is the subset-duplicate detector Jaccard misses: a document
    quoted whole inside a much larger one has Jaccard ≈ |small|/|big| → 0
    but containment(small→big) ≈ 1 (the RefinedWeb/CCNet-style "document
    embedded in boilerplate" case; public formulation: Broder 1997's
    containment coefficient alongside resemblance). Output is directional —
    (src_id, dst_id, n_common, containment) — because the metric is.

    Plan shape (key-partitioned shuffles only, no all-pairs): distinct
    shingle postings → optional df-cap → shingle self-join with id_a < id_b
    → per-pair overlap count ONCE → expand to the two directions and
    threshold each. The df-cap lever is identical to the Jaccard family's
    (``capped_postings``): set sizes keep counting dropped shingles, so the
    measured containment only shrinks — exact precision on the TRUE metric,
    recall loss confined to pairs whose overlap is boilerplate shingles;
    the fractional form stays recall-safe as the corpus grows.

    Identical-set collapse (``_worth_collapsing`` gate, the exact-Jaccard
    lemma): byte-identical post-cap shingle sets have identical overlap
    with everything, so exact-clone families join once through a
    representative and expand back — per-direction containment at the
    representative level (n_common/size of THAT side) is exactly each
    member pair's value, and within-family ordered pairs share the whole
    filtered set (containment = n_kept/set_size, 1.0 uncapped).
    """
    from pyspark import StorageLevel

    # persist: both sides of the overlap self-join (plus the collapse
    # machinery when engaged) consume postings — one head, not two
    # (guide §2.4; same fix as ngram_jaccard_pairs)
    postings = capped_postings(
        df, id_col, text_col, n, max_doc_freq=max_doc_freq, max_doc_frac=max_doc_frac
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if not _worth_collapsing(df, text_col):
        return _directional_containment(_containment_counts(postings), threshold)
    members = _identical_set_members(postings).persist(StorageLevel.MEMORY_AND_DISK)
    rpost = postings.join(members.filter(col("id") == col("rep")).select("id"), "id")
    rep_dir = _directional_containment(_containment_counts(rpost), threshold)
    ms = members.select(col("rep").alias("src_id"), col("id").alias("m_src"))
    md = members.select(col("rep").alias("dst_id"), col("id").alias("m_dst"))
    cross = (
        rep_dir.join(ms, "src_id")
        .join(md, "dst_id")
        .select(
            col("m_src").alias("src_id"),
            col("m_dst").alias("dst_id"),
            "n_common",
            "containment",
        )
    )
    m1 = members.select("set_fp", "set_size", col("id").alias("src_id"), "n_kept")
    m2 = members.select("set_fp", "set_size", col("id").alias("dst_id"))
    within = (
        m1.join(m2, ["set_fp", "set_size"])
        .filter(col("src_id") != col("dst_id"))
        .withColumn("containment_raw", col("n_kept") / col("set_size"))
        .filter(col("containment_raw") >= threshold)
        .select(
            "src_id",
            "dst_id",
            col("n_kept").alias("n_common"),
            fp_ratio("n_kept", "set_size").alias("containment"),
        )
    )
    return cross.unionByName(within)


def portable_hash60(e, seed: int | None = None):
    """60-bit hash both engines compute identically: the integer value of
    the first 15 hex chars of ``md5('{seed}:' || e)``.

    DuckDB twin: ``('0x' || substr(md5(CAST({seed} AS VARCHAR) || ':' || e),
    1, 15))::BIGINT`` (verified byte-for-byte; DuckDB parses '0x…' casts).
    15 hex chars = 60 bits, always positive, fits a signed BIGINT in both.

    This is the oracle-portability lever for the MinHash/SimHash family
    (VERDICT r3 #2): xxhash64 has no DuckDB twin, md5 does. xxhash64 stays
    the default in the operators (single fused JVM intrinsic, no string
    digest materialization) — portable mode is for oracle-checked queries
    and costs one md5 per (row, seed), still whole-stage codegen.
    """
    prefix = F.lit("" if seed is None else f"{seed}:")
    return F.conv(F.substring(F.md5(F.concat(prefix, e)), 1, 15), 16, 10).cast("long")


PORTABLE_HASH60_SQL = "(('0x' || substr(md5({prefix}{e}), 1, 15))::BIGINT)"


def portable_hash60_sql(e: str, seed: int | None = None) -> str:
    """DuckDB twin of :func:`portable_hash60` (same bytes in, same int out)."""
    prefix = "" if seed is None else f"'{seed}:' || "
    return PORTABLE_HASH60_SQL.format(prefix=prefix, e=e)


def jaccard_topmatch(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-document BEST exact-Jaccard match at or above ``threshold`` —
    the LINEAR-OUTPUT contract for the exact near-dup family (VERDICT r3
    What's-wrong #2: emit-all-pairs is quadratic in clone-family size, so
    the registered 100 TB-facing form must bound its output; pair emission
    stays available as :func:`ngram_jaccard_pairs` /
    :func:`jaccard_prefix_filter_pairs` library calls).

    For every document with at least one qualifying partner, returns the
    single best one: highest Jaccard, ties broken by lowest partner id.
    Output is ≤ one row per document regardless of family size — a 100-way
    clone family emits 100 rows (each member → its best partner), not
    4 950 pair rows.

    Candidates come from the lossless prefix filter
    (:func:`jaccard_prefix_filter_pairs`), so precision AND recall are
    exact while candidate volume stays sublinear; the per-doc argmax is a
    symmetrized row_number window partitioned by doc id (key-partitioned
    shuffle, no global order).

    Symmetrization is a single-pass ``explode(array(struct…))`` — a
    two-branch union here would plan the ENTIRE candidate+verification
    subtree twice (only the postings inside it are persisted), which is
    exactly the 8.2→11.6 s driver-bench regression VERDICT r6 asked to
    pin: measured quiet at sf0.1, the union form pays the prefix-filter
    join twice (~7-8 s) where the explode pays it once.

    Returns (id, match_id, n_common, jaccard).
    """
    pairs = jaccard_prefix_filter_pairs(df, id_col, text_col, n=n, threshold=threshold)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(col("id_a").alias("id"), col("id_b").alias("match_id")),
                F.struct(col("id_b").alias("id"), col("id_a").alias("match_id")),
            )
        ).alias("e"),
        "n_common",
        "jaccard",
    ).select(col("e.id").alias("id"), col("e.match_id").alias("match_id"), "n_common", "jaccard")
    w = Window.partitionBy("id").orderBy(col("jaccard").desc(), col("match_id"))
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .select("id", "match_id", "n_common", "jaccard")
    )


_MH_P = 2147483647  # 2^31 - 1, prime — the affine-family modulus


def _mh_ab(i: int) -> tuple[int, int]:
    """Deterministic affine-family coefficients for seed ``i``: content-
    addressed from md5 (the random_project_fp convention — no RNG, any
    engine rebuilds them), a_i ∈ [1, p), b_i ∈ [0, p)."""
    import hashlib

    a = int(hashlib.md5(f"mh_a{i}".encode()).hexdigest()[:15], 16) % (_MH_P - 1) + 1
    b = int(hashlib.md5(f"mh_b{i}".encode()).hexdigest()[:15], 16) % _MH_P
    return a, b


def _minhash_from_postings(
    postings: DataFrame, num_hashes: int, portable: bool = False
) -> DataFrame:
    if portable:
        # ONE md5 per posting + an affine universal family over Z_p:
        # h_i(s) = (a_i·h(s) + b_i) mod p with h(s) = portable_hash60 mod p.
        # Equivalent min-hash quality to per-seed hashing (Carter–Wegman
        # universal family) at 1/num_hashes the digest cost, and the DuckDB
        # oracle replays the same integer ops from the same one md5
        # (formerly 32 md5s per posting — the dominant cost both sides).
        # a_i·h < 2^62 — no BIGINT overflow.
        postings = postings.withColumn(
            "_b0", F.pmod(portable_hash60(col("shingle")), F.lit(_MH_P))
        )
        aggs = []
        for i in range(num_hashes):
            a_i, b_i = _mh_ab(i)
            aggs.append(
                F.min((F.lit(a_i) * col("_b0") + F.lit(b_i)) % F.lit(_MH_P)).alias(
                    f"h{i}"
                )
            )
    else:
        aggs = [
            F.min(F.xxhash64("shingle", F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    flat = postings.groupBy("id", "set_size").agg(*aggs)
    return flat.select(
        "id",
        "set_size",
        F.array(*[col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    portable: bool = False,
) -> DataFrame:
    """MinHash signatures: sig[i] = min over shingles of h_i(shingle)
    (xxhash64-per-seed by default; ``portable=True`` switches to ONE
    md5-derived :func:`portable_hash60` per shingle expanded by the
    Carter–Wegman affine family (a_i·h+b_i) mod 2^31−1, so a DuckDB
    oracle replays the signature at 1/num_hashes the digest cost).

    Flat codegen shape: one row per (doc, shingle), ``num_hashes``
    min-aggregates. Partial mins combine map-side, so the shuffle carries
    one row per doc regardless of document length.
    """
    return _minhash_from_postings(
        shingle_postings(df, id_col, text_col, n), num_hashes, portable=portable
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    portable: bool = False,
    max_bucket_frac: float | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verification.

    LSH generates candidates (any pair agreeing on a full band bucket);
    candidates are then verified with exact Jaccard via the shingle
    postings, so precision is exact and only recall depends on (bands,
    rows). With 32 hashes / 8 bands of 4 rows, P(candidate | J=t) =
    1-(1-t^4)^8 ≈ 0.98 at t=0.8.

    Scale: signatures are fixed 32×8 bytes/doc regardless of doc length;
    band buckets are the shuffle key. Hot buckets (near-identical-yet-
    DISTINCT boilerplate — exact clones are absorbed by the identical-set
    collapse below) still pair quadratically inside the band self-join;
    ``max_bucket_frac`` is the 100 TB lever for them (VERDICT r5 #2): a
    (band, bucket) holding more than ``greatest(ceil(frac · n_docs), 1)``
    DOCUMENTS is boilerplate noise and is dropped from candidate
    generation. Data-size-relative (CLAUDE.md rule 7), and counted in
    documents — the sum of clone-family sizes in the collapsed path,
    plain count(*) in the direct path — so the clone-fraction gate stays
    value-invisible: bucket survival is identical on either path, and
    within-family pairs are emitted exactly when ≥1 of the family's
    buckets survives (a family sized over the cap floods all 8 of its
    band buckets, so its pairs drop on both paths alike). Recall loss is
    confined to pairs ALL of whose agreeing bands are boilerplate-hot;
    precision stays exact (verification is unchanged). Default None =
    no cap (oracle mode).
    """
    if num_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    rows_per_band = num_hashes // bands
    # postings feed BOTH the signatures and the verification join; persist
    # so the tokenize→explode→window→distinct pipeline (the expensive
    # stage) runs once, not twice. MEMORY_AND_DISK: postings are (id,
    # shingle) pairs — larger than the docs but spillable. The blocks stay
    # cached for the session (LRU-evicted under pressure); long-lived
    # sessions issuing many dedup runs should unpersist via
    # spark.catalog.clearCache() between sweeps.
    from pyspark import StorageLevel

    # persist immediately: all_postings feed the signature aggregation, the
    # verification join, AND (in the collapsed branch) the identical-set
    # machinery — without it the tokenize head re-plans per consumer
    all_postings = shingle_postings(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # identical-set collapse (round 4, same lemma as the exact-Jaccard
    # family): identical shingle sets have identical signatures, identical
    # band buckets, and identical verification outcomes, so exact-clone
    # families go through LSH once via a representative — candidates and
    # verification stop scaling with the g² clone factor. Within-group
    # pairs are always emitted (all bands collide, Jaccard exactly 1 ≥ t).
    # Gated by the clone-fraction pre-check (VERDICT r4 #5): value-identical
    # either way, and on a clone-free corpus the collapse is pure overhead.
    collapse = _worth_collapsing(df, text_col)
    if collapse:
        members, _ = _collapsed_pair_structure(all_postings, threshold=2.0)  # pairs unused
        postings = all_postings.join(
            members.filter(col("id") == col("rep")).select("id"), "id"
        ).persist(StorageLevel.MEMORY_AND_DISK)
    else:
        postings = all_postings  # already persisted above
    sigs = _minhash_from_postings(postings, num_hashes, portable=portable)
    if portable:
        # bucket key = the band's raw signature slice joined as a string —
        # plain value equality, so the DuckDB oracle reproduces the exact
        # same buckets with string_agg(... ORDER BY seed)
        band_cols = [
            F.concat_ws(
                "|", *[col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
            ).alias(f"band{b}")
            for b in range(bands)
        ]
    else:
        band_cols = [
            F.xxhash64(
                *[col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
            ).alias(f"band{b}")
            for b in range(bands)
        ]
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), band_cols[b].alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", col("bb.band").alias("band"), col("bb.bucket").alias("bucket"))

    if max_bucket_frac is not None:
        # hot-bucket cap: drop (band, bucket) rows whose DOCUMENT mass
        # exceeds ceil(frac · n_docs). Mass = Σ clone-family sizes in the
        # collapsed path (banded rows are representatives), count(*) in
        # the direct path — the same number either way, so the gate stays
        # value-invisible. One window over the banding shuffle's own key.
        n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
        if collapse:
            fam_sizes = members.groupBy("rep").agg(F.count(F.lit(1)).alias("_g"))
            banded = banded.join(
                fam_sizes.withColumnRenamed("rep", "id"), "id"
            )
        else:
            banded = banded.withColumn("_g", F.lit(1))
        w_bucket = Window.partitionBy("band", "bucket")
        banded = (
            banded.crossJoin(F.broadcast(n_docs))
            .withColumn("_mass", F.sum("_g").over(w_bucket))
            .filter(
                col("_mass")
                <= F.greatest(
                    F.ceil(F.lit(max_bucket_frac) * col("n_docs")), F.lit(1)
                )
            )
            .drop("_g", "_mass", "n_docs")
        )

    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(col("x.id") < col("y.id"))
        .select(col("x.id").alias("id_a"), col("y.id").alias("id_b"))
        .distinct()
    )

    pa = postings.select(col("id").alias("id_a"), col("set_size").alias("size_a"), "shingle")
    pb = postings.select(col("id").alias("id_b"), col("set_size").alias("size_b"), "shingle")
    rep_pairs = (
        cand.join(pa, "id_a")
        .join(pb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .withColumn(
            "jaccard_raw", col("n_common") / (col("size_a") + col("size_b") - col("n_common"))
        )
        .filter(col("jaccard_raw") >= threshold)
        .select(
            "id_a",
            "id_b",
            fp_ratio("n_common", "size_a + size_b - n_common").alias("jaccard"),
        )
    )
    if not collapse:
        return rep_pairs
    ma = members.select(col("rep").alias("id_a"), col("id").alias("m_a"))
    mb = members.select(col("rep").alias("id_b"), col("id").alias("m_b"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("m_a", "m_b").alias("id_a"),
            F.greatest("m_a", "m_b").alias("id_b"),
            "jaccard",
        )
    )
    members_w = members
    if max_bucket_frac is not None:
        # a family whose EVERY band bucket breached the cap generates no
        # candidates on the direct path either — its within-pairs drop on
        # both paths alike; survivors (≥1 surviving bucket row) emit as
        # usual. banded is already cap-filtered here.
        surviving = banded.select(col("id").alias("rep")).distinct()
        members_w = members.join(surviving, "rep")
    m1 = members_w.select("set_fp", "set_size", col("id").alias("id_a"))
    m2 = members_w.select("set_fp", "set_size", col("id").alias("id_b"))
    within = (
        m1.join(m2, ["set_fp", "set_size"])
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b", F.lit(1.0).alias("jaccard"))
    )
    return cross.unionByName(within)


def incremental_minhash_lsh(
    batch: DataFrame,
    state_path: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    est_threshold: float = 0.5,
    batch_tag: int | str | None = None,
    shuffle_partitions: int | str | None = None,
) -> DataFrame:
    """NEAR-dup detection of a new batch against the historical corpus via
    persisted MinHash band buckets — the probabilistic sibling of
    :func:`incremental_exact_dedup` (VERDICT r3 #8), and the operator a
    continuously-ingesting pipeline runs when exact fingerprints are not
    enough: corpus-scale signature work happened once, historically; each
    increment computes ITS OWN signatures and probes only the band buckets
    they land in.

    State is a parquet table at ``state_path/bands`` — (band, bucket, id,
    sig), partitioned by band (a pure function of the upsert key, the
    upsert_by_key contract). Per batch:

    1. portable MinHash signatures for the batch (one md5 per posting +
       the affine family — engine-replayable, see :func:`_mh_ab`);
    2. candidates = batch rows joining state rows on (band, bucket), plus
       batch-internal band collisions (both directions — each batch doc
       reports all its matches);
    3. similarity is estimated from SIGNATURES alone — est = (# agreeing
       min-hashes)/num_hashes, the classic unbiased MinHash estimator —
       so the state never needs the historical postings or text, 32
       BIGINTs per document total;
    4. decisions are materialized before the state update, then the
       batch's banded signatures upsert into state (replay-idempotent:
       re-ingesting a batch recreates identical state rows and decisions).

    Returns (id, match_id, n_agree, est_jaccard) with id from the batch,
    match_id from history or batch, est_jaccard = n_agree/num_hashes
    (an exact binary fraction — identical across engines) ≥
    ``est_threshold``.

    ``shuffle_partitions`` scopes ``spark.sql.shuffle.partitions`` around
    this call (set → act → restore, the run_to_memory convention): an
    increment is typically orders of magnitude smaller than the corpus,
    and sizing its shuffles to BATCH volume instead of the session's
    corpus-sized width cuts per-micro-batch task overhead (VERDICT r5 #5;
    at 100 TB the same knob goes UP with increment volume). Pass the
    string ``"auto"`` to size it FROM the batch — one count() per
    increment, then ``clamp(ceil(rows/8192), 8, 4·defaultParallelism)``
    (~8k docs ≈ 800k shingle postings per task): a fixed integer sized to
    one fixture is exactly the scale-absolute CLAUDE.md rule 7 bans, and
    it cost 1.6× at the 100× differential before auto-sizing existed.
    Results are partitioning-invariant, so the knob never changes
    decisions.
    """
    import os

    from pyspark import StorageLevel

    from map_reduce_group_spark.operators.incremental import upsert_by_key

    spark = batch.sparkSession
    rows_per_band = num_hashes // bands
    if num_hashes % bands != 0:
        raise ValueError(f"bands ({bands}) must divide num_hashes ({num_hashes})")
    saved_sp = spark.conf.get("spark.sql.shuffle.partitions")
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    n_batch: int | None = None
    if shuffle_partitions == "auto":
        n_batch = batch.count()
        shuffle_partitions = min(
            max(8, -(-n_batch // 8192)),
            4 * spark.sparkContext.defaultParallelism,
        )
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # with shuffles explicitly sized to increment volume, AQE has
        # nothing left to decide here — but it still materializes a query
        # stage (a driver job boundary) per exchange, and an increment's
        # wall is job-floor-bound (profiled: 26 jobs / ~0.5 s of parallel
        # compute at sf0.1). Scoped set→act→restore like the partition knob;
        # results are partitioning-invariant either way.
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    sigs = minhash_signatures(batch, id_col, text_col, n, num_hashes, portable=True)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|",
                            *[
                                col("sig")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(col("bb.band").alias("band"), col("bb.bucket").alias("bucket"), "id", "sig")
    # banded feeds BOTH the decisions and the state write — persist so the
    # tokenize→explode→window→32-min signature chain (the expensive stage)
    # runs once per increment, not twice (VERDICT r5 #5)
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)

    try:
        table = os.path.join(state_path, "bands")
        has_history = os.path.exists(table)
        left = banded.select("band", "bucket", "id", "sig")
        right = banded.select(
            "band", "bucket", col("id").alias("match_id"), col("sig").alias("msig")
        )
        cands = (
            left.join(right, ["band", "bucket"])
            .filter(col("id") != col("match_id"))
            .select("id", "sig", "match_id", "msig")
        )
        if has_history:
            history = spark.read.parquet(table).select(
                "band", "bucket", col("id").alias("match_id"), col("sig").alias("msig")
            )
            cand_hist = (
                banded.join(history, ["band", "bucket"])
                # a replayed batch finds its own signatures in state — a doc
                # is never its own near-dup, and excluding it keeps replays
                # idempotent
                .filter(col("id") != col("match_id"))
                .select("id", "sig", "match_id", "msig")
            )
            cands = cand_hist.unionByName(cands)
        # else: the first increment has no buckets to probe — the history
        # join and its signature-agreement estimate are skipped outright
        # (value-identical: the join against an empty state is empty)

        # estimate BEFORE the pair dedup: band-duplicate candidates carry the
        # same signatures, so n_agree is identical per (id, match_id) and the
        # dedup shuffle moves 3 longs per row instead of two 32-long arrays
        n_agree = sum(
            F.when(col("sig")[i] == col("msig")[i], 1).otherwise(0)
            for i in range(num_hashes)
        )
        decisions = (
            cands.withColumn("n_agree", n_agree.cast("long"))
            .withColumn("est_jaccard", col("n_agree") / float(num_hashes))
            .filter(col("est_jaccard") >= est_threshold)
            .select("id", "match_id", "n_agree", "est_jaccard")
            .dropDuplicates(["id", "match_id"])
        )
        # decisions dir keyed by the CALLER'S batch tag when given: a
        # redelivered micro-batch (foreachBatch restart after a
        # pre-checkpoint crash) then OVERWRITES its own dir instead of
        # appending a duplicate decisions_N — without a tag, a positional
        # counter serves in-process sequential ingest
        if batch_tag is None:
            batch_tag = (
                len([d for d in os.listdir(state_path) if d.startswith("decisions_")])
                if os.path.exists(state_path)
                else 0
            )
        out_dir = os.path.join(state_path, f"decisions_{batch_tag}")
        # size the decisions write to DECISION volume, not to the shuffle
        # width: an increment's decisions are a few dozen bytes per row, so
        # shuffle_partitions-many writer tasks produce that many tiny files
        # and pay per-file create/commit latency each batch (guide §6 —
        # measured on this host: 1.9 s for a 32-file tiny write vs 0.27 s
        # for 4). ~1M rows per output file, growing with the increment.
        if n_batch is not None or isinstance(shuffle_partitions, int):
            est_rows = (
                n_batch
                if n_batch is not None
                else int(shuffle_partitions) * 8192
            )
            decisions = decisions.coalesce(max(1, -(-est_rows // 1_000_000)))
        dec_schema = decisions.schema
        decisions.write.mode("overwrite").parquet(out_dir)
        # read-back with the schema we just wrote: the decisions frame is
        # decoupled from the live plan (the contract) without paying a
        # footer-inference driver job per increment (guide §1/§6 — the
        # per-job floor dominates micro-batch walls)
        decided = spark.read.schema(dec_schema).parquet(out_dir)

        if has_history:
            # every doc emits every band (the explode is over range(bands)),
            # so a non-empty batch touches exactly the bands partitions —
            # pass them instead of paying a distinct-collect job per
            # increment. Only provable when the batch size is known here.
            known_parts = (
                list(range(bands)) if n_batch is not None and n_batch > 0 else None
            )
            upsert_by_key(
                banded, table, ["band", "bucket", "id"], "band", parts=known_parts
            )
        else:
            # cluster sized to the band count (the table's partition-value
            # count) — one file per band dir, not shuffle.partitions tasks
            # each paying per-file create/commit latency (guide §6)
            banded.repartition(bands, col("band")).write.partitionBy(
                "band"
            ).parquet(table)
        return decided
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_sp)
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
        banded.unpersist()


def simhash(df: DataFrame, id_col: str, text_col: str, portable: bool = False) -> DataFrame:
    """SimHash per document from word tokens — 64-bit (xxhash64, default)
    or 60-bit (``portable=True``, md5-derived :func:`portable_hash60` so a
    DuckDB oracle can replay every bit).

    simhash bit b = sign of Σ_tokens (±1 depending on bit b of
    hash(token)); near-duplicates differ in few bits (compare with
    hamming distance via bit_count(xor)).

    One explode + one groupBy(id) with one conditional-sum expression per
    bit — all codegen'd; no Python.
    """
    nbits = 60 if portable else 64
    base = spread_small_scan(
        df.select(col(id_col).alias("id"), col(text_col).alias("_text"))
    )
    tok = base.select("id", F.explode(tokens("_text")).alias("tok"))
    h = portable_hash60(col("tok")) if portable else F.xxhash64("tok")
    tok = tok.withColumn("h", h)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(nbits)
    ]
    agg = tok.groupBy("id").agg(*bit_sums)
    sim = None
    for b in range(nbits):
        term = F.when(
            col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim.bitwiseOR(term)
    return agg.select("id", sim.alias("simhash"))


#: Chunk-triple blocking combos for :func:`simhash_near_pairs` — all
#: C(6,3)=20 ways to pick 3 of the 6 10-bit signature chunks. Shared with
#: the DuckDB oracle (plans/llm.py) so both engines enumerate identically.
SIMHASH_COMBOS: list[tuple[int, int, int]] = [
    (i, j, k) for i in range(6) for j in range(i + 1, 6) for k in range(j + 1, 6)
]


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8, portable: bool = False
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on TRIPLES of
    10-bit signature chunks (Manku et al., WWW'07 §3 multi-table shape).

    The signature's low 60 bits split into 6 chunks of 10 bits; each doc
    emits one 30-bit block key per 3-chunk combination (C(6,3)=20 combos).
    Pigeonhole: ≤3 flipped bits touch ≤3 chunks, leaving ≥3 chunks clean,
    so some triple agrees — the SAME worst-case recall guarantee
    (hamming ≤ 3) as the former single-chunk 4×15-bit blocking, but with
    a 2³⁰ key space instead of 2¹⁵: random chunk collisions are
    20·N²/2³⁰ — ~5 candidates/doc at N=10⁹ — where single 15-bit chunks
    went quadratic at N=5·10⁵ (the r4 100× residual: ~10⁹ candidates,
    oracle OOM at 88 GB RSS). Beyond hamming 3 recall is heuristic in
    both geometries; the registered contract is the blocked candidate set.
    Non-portable 64-bit signatures block on their low 60 bits and verify
    hamming over all 64.
    """
    chunk_bits, mask = 10, (1 << 10) - 1
    sigs = simhash(df, id_col, text_col, portable=portable)

    def chunk(i: int):
        return F.shiftright(col("simhash"), i * chunk_bits).bitwiseAND(F.lit(mask))

    keys = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("combo"),
                        (
                            chunk(i) * F.lit(1 << 20)
                            + chunk(j) * F.lit(1 << 10)
                            + chunk(k)
                        ).alias("key"),
                    )
                    for ci, (i, j, k) in enumerate(SIMHASH_COMBOS)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", col("c.combo").alias("combo"), col("c.key").alias("key"))
    x, y = keys.alias("x"), keys.alias("y")
    # EXPLICIT merge hint (r7): Catalyst's static size estimate does not
    # survive the aggregate→explode chain above, so it plans this self-join
    # as a BroadcastHashJoin at EVERY scale — measured: 100M key rows
    # funneled into one 4 GB broadcast build at the 1000× fixture (5M docs)
    # and killed the job, after silently "working" (as an O(20·N) driver
    # funnel) at 100×. The blocked candidate join must shuffle on its
    # (combo, key) blocking key — SortMergeJoin, AQE-skew-splittable —
    # exactly like the Jaccard postings join; a broadcast here is never
    # right because the key table IS the corpus × 20.
    return (
        x.hint("merge")
        .join(y, ["combo", "key"])
        .filter(col("x.id") < col("y.id"))
        .select(
            col("x.id").alias("id_a"),
            col("y.id").alias("id_b"),
            F.bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).alias("hamming"),
        )
        .filter(col("hamming") <= max_hamming)
        .distinct()
    )


def span_dedup_stats(
    df: DataFrame, id_col: str, text_col: str, span_tokens: int = 16
) -> DataFrame:
    """Cross-corpus span-level exact dedup — the C4/CCNet pass (Raffel et
    al. 2020 §2.2 dedups three-sentence spans corpus-wide; CCNet dedups
    paragraphs by hash): split every document into non-overlapping
    ``span_tokens``-token spans, hash each span, and keep only the first
    corpus-wide occurrence (min (doc_id, span_id) — deterministic). Removes
    boilerplate shared ACROSS documents (headers, license blocks, navigation
    chrome) that document-level dedup can never see.

    Scale shape: the first-occurrence winner per span hash is a groupBy
    ``min(struct(id, span_id))`` — an *aggregate with map-side partial
    combine*, deliberately not a window over the hash (a hot span — think
    empty or one-word boilerplate — would funnel one partition; the partial
    agg collapses it executor-side first). Shuffle payload is (16-byte
    hash, id pair) only; the re-join to mark survivors is hash-keyed and
    AQE-skew-splittable.

    Returns per-document (id, n_spans, n_kept, removed_frac).
    """
    from map_reduce_group_spark.operators.text import chunk_documents

    spans = chunk_documents(df, id_col, text_col, chunk_size=span_tokens, overlap=0)
    hashed = spans.select("id", F.col("chunk_id").alias("span_id"), F.md5("chunk_text").alias("h"))
    first = hashed.groupBy("h").agg(F.min(F.struct("id", "span_id")).alias("keep"))
    marked = hashed.join(first, "h").select(
        "id",
        (
            (col("id") == col("keep.id")) & (col("span_id") == col("keep.span_id"))
        ).cast("long").alias("kept"),
    )
    n = F.count(F.lit(1))
    return (
        marked.groupBy("id")
        .agg(
            n.cast("long").alias("n_spans"),
            F.sum("kept").cast("long").alias("n_kept"),
        )
        # 1/10^6 integer fixed point (rule 1); per-document span counts,
        # so the ×10^6 product is bounded by doc length — no headroom risk
        .select(
            "id",
            "n_spans",
            "n_kept",
            fp_ratio("n_spans - n_kept", "n_spans").alias("removed_frac"),
        )
    )


def benchmark_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
) -> DataFrame:
    """Train-test contamination check — the decontamination pass every
    serious pre-training pipeline runs (GPT-3 App. C / PaLM / Llama all
    report n-gram-overlap decontamination of the training set against
    evaluation benchmarks): for each training document, how many of its
    distinct token n-grams also appear anywhere in the benchmark set.

    Scale shape: the benchmark side is collapsed to its DISTINCT n-gram set
    and **broadcast** — eval benchmarks are megabytes against a 100 TB
    corpus, so the overlap join must never shuffle the corpus postings.
    The corpus side is the existing distinct-shingle postings (posexplode +
    lead window, one doc-keyed shuffle); the per-doc totals reuse the
    postings' own ``set_size``, so no second aggregation pass over the data.

    ``n`` defaults to 13 (the GPT-3 convention); callers pick smaller n for
    short-vocabulary fixtures. Documents with fewer than ``n`` tokens have
    no n-grams and are absent from the output (nothing to contaminate).

    Returns (id, n_grams, n_shared, overlap_frac, contaminated).
    """
    cp = shingle_postings(corpus, id_col, text_col, n)
    bset = (
        shingle_postings(bench, id_col, text_col, n).select("shingle").distinct()
    )
    hits = (
        cp.join(F.broadcast(bset), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    totals = cp.groupBy("id").agg(F.max("set_size").alias("n_grams"))
    shared = F.coalesce(col("n_shared"), F.lit(0))
    return totals.join(hits, "id", "left").select(
        "id",
        col("n_grams").cast("long").alias("n_grams"),
        shared.cast("long").alias("n_shared"),
        fp_ratio("coalesce(n_shared, 0)", "greatest(n_grams, 1)").alias(
            "overlap_frac"
        ),
        (shared > 0).alias("contaminated"),
    )


def duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """Exact-substring duplicated spans at n-token granularity — the
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better") pass re-expressed relationally: any n-token gram occurring
    2+ times ANYWHERE in the corpus marks its positions, and overlapping
    marked windows merge into maximal duplicated spans per document (the
    text a substring-dedup pass would cut). The suffix-array machinery of
    the paper exists to find variable-length repeats; at fixed granularity
    the same spans fall out of three shuffles, each carrying compact keys:

    1. gram fingerprints: posexplode + a (0, n-1) rows window per doc —
       shuffle keyed by doc, payload (pos, md5 16 bytes), never raw text;
    2. duplicate fingerprints: groupBy(fp) HAVING count>1 — partial-agg
       combines map-side, shuffle carries (fp, count);
    3. span merge: gaps-and-islands per doc (new island when the gap
       exceeds n), min/max per island.

    Returns (id, span_start, span_end, span_len) in token positions
    (0-based inclusive)."""
    from pyspark import StorageLevel

    t = spread_small_scan(
        df.select(col(id_col).alias("id"), col(text_col).alias("_text"))
    ).select("id", F.posexplode(tokens("_text")).alias("pos", "tok"))
    wg = Window.partitionBy("id").orderBy("pos").rowsBetween(0, n - 1)
    # persist: grams (the md5-per-position window, the expensive stage)
    # feed both the duplicate-fingerprint aggregate and the hits join —
    # one gram pass, not two (guide §2.4)
    grams = (
        t.select(
            "id",
            "pos",
            F.md5(F.concat_ws(" ", F.collect_list("tok").over(wg)).cast("binary")).alias("fp"),
            F.count("tok").over(wg).alias("glen"),
        )
        .filter(col("glen") == n)
        .drop("glen")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dup = grams.groupBy("fp").agg(F.count(F.lit(1)).alias("c")).filter(col("c") > 1)
    hits = grams.join(dup.select("fp"), "fp").select("id", "pos")
    wi = Window.partitionBy("id").orderBy("pos")
    flagged = hits.withColumn(
        "ni",
        F.when(
            F.lag("pos").over(wi).isNull() | (col("pos") - F.lag("pos").over(wi) > n),
            1,
        ).otherwise(0),
    ).withColumn(
        "island", F.sum("ni").over(wi.rowsBetween(Window.unboundedPreceding, 0))
    )
    return flagged.groupBy("id", "island").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + n - 1).cast("long").alias("span_end"),
        (F.max("pos") + n - F.min("pos")).cast("long").alias("span_len"),
    ).select("id", "span_start", "span_end", "span_len")


def cut_duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 8
) -> DataFrame:
    """The APPLY step of exact-substring dedup (Lee et al. 2022 §3): remove
    every token covered by a duplicated n-gram and reassemble the surviving
    text. ``duplicated_spans`` reports where the corpus repeats itself; this
    pass actually cuts those spans (all occurrences — the paper's
    remove-all-copies variant, which is the deterministic one: keeping "the
    first" occurrence requires a global document order).

    Scale shape (100 TB): the only wide exchanges carry compact keys —
    (1) gram fingerprints (16-byte md5 + int pos), (2) fingerprint counts
    (map-side combined), (3) covered-position sets built by exploding each
    hit into ≤ n (id, pos) int pairs (never text), (4) per-doc reassembly
    via array_sort(collect_list(struct(pos,tok))) whose field extraction
    (``arr.tok`` → GetArrayStructFields) and array_join are native codegen
    expressions — zero interpreted lambdas per CLAUDE.md rule 2.

    Returns (id, n_tokens, n_cut, clean_md5): token counts plus the md5 of
    the space-joined surviving tokens (digest, not raw text, so the result
    stays driver-friendly at any corpus size; precedent doc_unicode_normalize).
    """
    from pyspark import StorageLevel

    # persist both fanout points: base feeds the token explode AND the
    # final per-doc join; grams (the md5-per-position window, the
    # expensive stage) feed the duplicate aggregate AND the coverage join
    # (guide §2.4 — one tokenize head, one gram pass)
    base = (
        spread_small_scan(
            df.select(col(id_col).alias("id"), col(text_col).alias("_text"))
        )
        .select("id", tokens("_text").alias("toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    t = base.select("id", F.posexplode("toks").alias("pos", "tok"))
    wg = Window.partitionBy("id").orderBy("pos").rowsBetween(0, n - 1)
    grams = (
        t.select(
            "id",
            "pos",
            F.md5(F.concat_ws(" ", F.collect_list("tok").over(wg)).cast("binary")).alias("fp"),
            F.count("tok").over(wg).alias("glen"),
        )
        .filter(col("glen") == n)
        .drop("glen")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dup = grams.groupBy("fp").agg(F.count(F.lit(1)).alias("c")).filter(col("c") > 1)
    cov = (
        grams.join(dup.select("fp"), "fp")
        .select("id", F.explode(F.sequence(col("pos"), col("pos") + n - 1)).alias("pos"))
        .distinct()
    )
    kept = t.join(cov, ["id", "pos"], "left_anti")
    clean = (
        kept.groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias("a"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .select("id", F.array_join(col("a.tok"), " ").alias("clean_text"), "n_kept")
    )
    return (
        base.join(clean, "id", "left")
        .select(
            "id",
            F.size("toks").cast("long").alias("n_tokens"),
            (F.size("toks") - F.coalesce(col("n_kept"), F.lit(0))).cast("long").alias("n_cut"),
            F.md5(F.coalesce(col("clean_text"), F.lit(""))).alias("clean_md5"),
        )
    )
