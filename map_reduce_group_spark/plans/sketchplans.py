"""Probabilistic-structure and sampling queries over the documents corpus:
deterministic HyperLogLog, Bloom-filter membership, and weighted systematic
sampling — the sketch/sampling layer a 100 TB curation pipeline leans on
when key spaces stop fitting anywhere (distinct URL counts, blocklist
membership, token-budget ablation draws).

All three families follow the repo's sketch-determinism doctrine
(operators/sketches.py module docstring): hashing is md5-derived and
identical in both engines, so the STRUCTURES themselves — register arrays,
bit positions, tick selections — are oracle-checked bit-for-bit, not just
property-tested. Spark's builtin approximations (approx_count_distinct,
DataFrameStatFunctions' Bloom) stay covered rows-only elsewhere because
their internals are engine-private; these variants exist precisely to make
the sketch layer verifiable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col

from map_reduce_group_spark.catalog import load_table
from map_reduce_group_spark.operators.sketches import (
    bloom_build,
    bloom_probe,
    hll_alpha_numerator,
    hll_estimate,
    hll_estimate_by,
    hll_registers,
)
from map_reduce_group_spark.operators.text import token_count

# the one tokenizer convention, shared with every other token oracle
from map_reduce_group_spark.plans.llm import _TOKS_SQL
from map_reduce_group_spark.plans.registry import register

_HLL_P = 10
_HLL_M = 1 << _HLL_P
_ALPHA_NUM = hll_alpha_numerator(_HLL_P)  # shared double literal (repr round-trips)

# DuckDB twin of one HLL-hashed key: (bucket, w) from two md5 slices. The
# key space is the DOCUMENT FINGERPRINT (md5(text)) — "how many unique
# documents does this corpus hold pre-dedup?", the cardinality question a
# curation pipeline asks before committing to an exact dedup shuffle. The
# fixture's token vocabulary is ~31 words at every SF (scale-DEGENERATE,
# rule 7), while unique docs grow with the corpus — so fingerprints are the
# key space that actually exercises the sketch as data scales.
_HLL_HASH_SQL = f"""
        SELECT CAST(('0x' || substr(md5(fp), 1, 8))::UBIGINT % {_HLL_M} AS BIGINT) AS bucket,
               CAST(('0x' || substr(md5(fp), 17, 12))::UBIGINT AS BIGINT) AS w
        FROM fps
"""
_HLL_KEYS_SQL = "SELECT DISTINCT md5(text) AS fp FROM documents WHERE text IS NOT NULL"


@register(
    "sketch_hll_registers",
    oracle=f"""
    WITH fps AS ({_HLL_KEYS_SQL}), h AS ({_HLL_HASH_SQL})
    SELECT bucket,
           CAST(max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS BIGINT)
               AS register
    FROM h GROUP BY 1
    """,
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic HyperLogLog register array over document
    fingerprints (operators/sketches.py:hll_registers, p=10): bucket and
    rank observable are independent md5 slices, register = max rank per
    bucket, so the array is a pure function of the key SET and DuckDB
    rebuilds it bit-for-bit. Feeding the raw (clone-duplicated) stream vs
    the distinct set is value-identical by construction — max is
    idempotent — which is exactly the property that lets the distributed
    build skip the distinct shuffle entirely: ≤ m register rows leave each
    map task (partial max), regardless of input size or duplication."""
    d = load_table(spark, sf_dir, "documents")
    fps = d.filter(col("text").isNotNull()).select(F.md5("text").alias("fp"))
    return hll_registers(fps, "fp", p=_HLL_P)


@register(
    "sketch_hll_estimate",
    oracle=f"""
    WITH fps AS ({_HLL_KEYS_SQL}), h AS ({_HLL_HASH_SQL}),
    regs AS (
        SELECT bucket,
               max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS register
        FROM h GROUP BY 1
    ), s AS (
        SELECT count(*) AS occ,
               sum(CAST(1 AS BIGINT) << (48 - register)) AS inv_present
        FROM regs
    )
    SELECT CAST({_HLL_M} AS BIGINT) AS m,
           CAST(occ AS BIGINT) AS occupied_buckets,
           CAST({_HLL_M} - occ AS BIGINT) AS zero_buckets,
           CAST(inv_present + ({_HLL_M} - occ) * (CAST(1 AS BIGINT) << 48) AS BIGINT)
               AS inv_sum_num,
           CAST({_ALPHA_NUM!r} AS DOUBLE)
               / CAST(inv_present + ({_HLL_M} - occ) * (CAST(1 AS BIGINT) << 48) AS BIGINT)
               AS est_raw
    FROM s
    """,
)
def sketch_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row HLL unique-document estimate from the merged registers
    (operators/sketches.py:hll_estimate): the denominator Σ 2^(−M_j)
    rescaled to the exact BIGINT Σ 2^(48−M_j), and the raw estimator as
    ONE shared-literal double division — both engines round it
    identically, so even the double column hash-matches. Accuracy
    (~1.04/√m once n ≳ 2.5m) is pinned separately by the property suite
    against exact distinct counts; the small-range linear-counting
    correction needs ln() (libm-varying last ulp) and is deliberately
    left as driver-side policy over these integers."""
    d = load_table(spark, sf_dir, "documents")
    fps = d.filter(col("text").isNotNull()).select(F.md5("text").alias("fp"))
    return hll_estimate(fps, "fp", p=_HLL_P)


@register(
    "sketch_bloom_ingest_filter",
    oracle="""
    WITH ref AS (
        SELECT DISTINCT md5(text) AS fp
        FROM documents WHERE doc_id % 20 = 0 AND text IS NOT NULL
    ), geom AS (
        SELECT 32 * greatest(count(*), 1) AS m FROM ref
    ), bits AS (
        SELECT DISTINCT
            CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || fp), 1, 15))::UBIGINT
                 % (SELECT m FROM geom) AS BIGINT) AS pos
        FROM ref CROSS JOIN range(0, 5) r(i)
    ), probe AS (
        SELECT DISTINCT md5(text) AS fp FROM documents WHERE text IS NOT NULL
    ), pp AS (
        SELECT DISTINCT fp,
            CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || fp), 1, 15))::UBIGINT
                 % (SELECT m FROM geom) AS BIGINT) AS pos
        FROM probe CROSS JOIN range(0, 5) r(i)
    ), hits AS (
        SELECT pp.fp, count(*) AS need, count(b.pos) AS got
        FROM pp LEFT JOIN bits b ON pp.pos = b.pos
        GROUP BY 1
    )
    SELECT h.fp, h.need = h.got AS bloom_member, r.fp IS NOT NULL AS exact_member
    FROM hits h LEFT JOIN ref r ON h.fp = r.fp
    """,
)
def sketch_bloom_ingest_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom-filter "already ingested?" membership
    (operators/sketches.py:bloom_build/bloom_probe, k=5): the reference
    set is the fingerprints of every 20th document (a fixed FRACTION of
    the corpus — the previously-ingested snapshot), the probe is every
    document fingerprint, and the verdict per fingerprint — INCLUDING the
    false-positive set, which is part of the deterministic contract — is
    replayed exactly by DuckDB from the same md5 positions.
    ``exact_member`` rides along so the FP rate is auditable in-row.

    Scale stability (rule 7): the filter is sized to its content —
    m = 32·|ref| bits (k/(m/n) = 5/32 load, FP ≈ 6e-5) — so it neither
    saturates as the corpus grows nor wastes bits when small; both engines
    derive m from the same count. Scale shape: the filter is ≤ m position
    rows broadcast to the probe side (map-side join); the probe never
    shuffles its key space; the ref-count action is one scalar."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.filter(col("text").isNotNull())
    ref = docs.filter(col("doc_id") % 20 == 0).select(F.md5("text").alias("fp"))
    n_ref = ref.distinct().count()
    m_bits = 32 * max(n_ref, 1)
    probe = docs.select(F.md5("text").alias("fp"))
    bits = bloom_build(ref, "fp", m_bits=m_bits, k=5)
    verdict = bloom_probe(bits, probe, "fp", m_bits=m_bits, k=5)
    exact = ref.select(col("fp").alias("key")).distinct().withColumn("x", F.lit(1))
    return verdict.join(exact, "key", "left").select(
        col("key").alias("fp"),
        "bloom_member",
        col("x").isNotNull().alias("exact_member"),
    )


@register(
    "sample_weighted_tokens",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, CAST(len({_TOKS_SQL}) AS BIGINT) AS wt,
               md5('wsys' || CAST(doc_id AS VARCHAR)) AS ord
        FROM documents
    ), pos AS (
        SELECT doc_id, wt,
               sum(wt) OVER (ORDER BY ord, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM w WHERE wt > 0
    ), sel AS (
        SELECT doc_id, wt,
               (cum * 25) // (SELECT sum(wt) FROM w WHERE wt > 0)
               - ((cum - wt) * 25) // (SELECT sum(wt) FROM w WHERE wt > 0)
                   AS multiplicity
        FROM pos
    )
    SELECT doc_id AS id, wt AS weight, CAST(multiplicity AS BIGINT) AS multiplicity
    FROM sel WHERE multiplicity > 0
    """,
)
def sample_weighted_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sample of ~25 documents with inclusion probability
    proportional to token count (operators/sampling.py:
    weighted_systematic_sample) — the token-budget ablation draw of corpus
    curation, deterministic via md5-permutation ordering and exact-BIGINT
    tick arithmetic. The oracle replays the identical selection with a
    plain SQL running sum; the engine computes the same prefix sums with
    the two-pass distributed scan (range-partition subtotals + O(P) driver
    offsets — pack_sequences' shape), so no partition-less Window exists
    in the plan while the selected set is bit-identical. Output is ~n rows
    at ANY corpus scale (bounded, top-k-like)."""
    from map_reduce_group_spark.operators.sampling import weighted_systematic_sample

    d = load_table(spark, sf_dir, "documents")
    withw = d.select("doc_id", token_count("text").cast("long").alias("wt"))
    return weighted_systematic_sample(withw, "doc_id", "wt", n=25).select(
        col("id"), "weight", "multiplicity"
    )


@register(
    "sketch_hll_by_lang",
    oracle=f"""
    WITH fps AS (
        SELECT DISTINCT lang, md5(text) AS fp
        FROM documents WHERE text IS NOT NULL
    ), h AS (
        SELECT lang,
               CAST(('0x' || substr(md5(fp), 1, 8))::UBIGINT % {_HLL_M} AS BIGINT) AS bucket,
               CAST(('0x' || substr(md5(fp), 17, 12))::UBIGINT AS BIGINT) AS w
        FROM fps
    ), regs AS (
        SELECT lang, bucket,
               max(CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END) AS register
        FROM h GROUP BY 1, 2
    ), s AS (
        SELECT lang, count(*) AS occ,
               sum(CAST(1 AS BIGINT) << (48 - register)) AS inv_present
        FROM regs GROUP BY 1
    )
    SELECT lang,
           CAST({_HLL_M} AS BIGINT) AS m,
           CAST(occ AS BIGINT) AS occupied_buckets,
           CAST({_HLL_M} - occ AS BIGINT) AS zero_buckets,
           CAST(inv_present + ({_HLL_M} - occ) * (CAST(1 AS BIGINT) << 48) AS BIGINT)
               AS inv_sum_num,
           CAST({_ALPHA_NUM!r} AS DOUBLE)
               / CAST(inv_present + ({_HLL_M} - occ) * (CAST(1 AS BIGINT) << 48) AS BIGINT)
               AS est_raw
    FROM s
    """,
)
def sketch_hll_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL as a GROUPED aggregate (operators/sketches.py:hll_estimate_by):
    one independent register array — hence one unique-document estimate —
    per language, the "distinct docs per language/domain" data-card metric
    computed with ≤ m state rows per group instead of a per-group distinct
    shuffle. Per-group keying means a group's sketch is unaffected by every
    other group's volume (no shared-register contamination), and the output
    is n_groups rows at any corpus scale. Determinism contract identical to
    `sketch_hll_estimate` (exact-BIGINT denominators, one shared-literal
    division per group)."""
    d = load_table(spark, sf_dir, "documents")
    fps = d.filter(col("text").isNotNull()).select("lang", F.md5("text").alias("fp"))
    return hll_estimate_by(fps, "fp", ["lang"], p=_HLL_P)
