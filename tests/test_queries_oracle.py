"""One test per registered query: oracle-checked queries hash-match DuckDB;
rows-only queries must run, have a stable schema, and be deterministic."""

from __future__ import annotations

import pytest

from map_reduce_group_spark.plans import REGISTRY
from map_reduce_group_spark.plans.registry import COST_HINT
from tests.helpers import assert_matches_oracle

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


# quick subset = the oracle core minus the heavy tail (COST_HINT >= 5 s at
# sf0.1 — streaming ingest, BPE, clusters, pagerank), keeping `-m quick`
# inside the CLAUDE.md <3 min inner-loop budget
@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.quick)
        if COST_HINT.get(n, 0.0) < 5.0
        else pytest.param(n)
        for n in ORACLE_QUERIES
    ],
)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    try:
        df = spec.builder(spark, sf_dir)
        assert_matches_oracle(df, spec.oracle, sf_dir, name=name)
    except Exception:
        if not name.startswith("stream_"):
            raise
        # streaming builders execute a full micro-batch pipeline whose
        # scheduling is sensitive to external host load (observed: one
        # availableNow drain flaking while a second Spark JVM saturated
        # all cores, passing in isolation). Batch determinism is already
        # proven by the oracle itself — retry once before declaring red.
        df = spec.builder(spark, sf_dir)
        assert_matches_oracle(df, spec.oracle, sf_dir, name=name)


@pytest.mark.quick
@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.builder(spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert df.columns == spec.builder(spark, sf_dir).columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_no_driver_facing_array_or_map_columns(spark, sf_dir):
    """The driver's canonicalizer sorts result frames with pandas, which
    crashes on unhashable ndarray cells (CORRECTNESS_r02:
    embed_quantize_int8 ERR) — no registered query may expose a top-level
    array or map column; nested data must leave as exploded long format
    or delimited strings. Streaming queries are skipped only because their
    builders execute the full micro-batch pipeline (their outputs are
    checked by the oracle tests anyway)."""
    from pyspark.sql.types import ArrayType, MapType

    bad = {}
    for name, spec in REGISTRY.items():
        if name.startswith("stream_"):
            continue
        schema = spec.builder(spark, sf_dir).schema
        offenders = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType))
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, f"array/map-typed driver-facing columns: {bad}"


@pytest.mark.quick
def test_scale_oracle_standins_match_driver_oracles():
    """Every SCALE_ORACLES stand-in (the pruned/collapsed SQL tools/
    diff_scale.py substitutes at 10×/100×/1000×) must be VALUE-IDENTICAL
    to the registered driver oracle — that is the stand-in's entire
    contract. Enforce it at sf0.01 where both forms are tractable:
    pure DuckDB, no Spark, so a drifted stand-in is caught in the suite
    instead of at the next manual scale sweep (the ADVICE r5 #1 gap class,
    closed for the Jaccard collapse branches by the A/B property tests;
    this closes it for the SQL side)."""
    from map_reduce_group_spark.plans.llm import SCALE_ORACLES
    from tests.helpers import canonicalize, dtype_skew, run_oracle

    sf = "/root/testdata/sf0.01"
    bad = []
    for name, scale_sql in SCALE_ORACLES.items():
        spec = REGISTRY[name]
        assert spec.oracle is not None, f"{name}: scale stand-in without a driver oracle"
        want = run_oracle(spec.oracle, sf)
        got = run_oracle(scale_sql, sf)
        ok = (
            canonicalize(got) == canonicalize(want)
            and sorted(got.columns) == sorted(want.columns)
            and not dtype_skew(got, want)
        )
        if not ok:
            bad.append(f"{name} (scale={len(got)} rows, driver={len(want)} rows)")
    assert not bad, f"scale stand-ins diverge from driver oracles at sf0.01: {bad}"


def test_no_vacuous_oracles_at_driver_scale():
    """Every DuckDB oracle must return at least one row at sf0.01 — the
    scale the external driver hash-compares at. A 0-row oracle makes the
    driver's MATCH vacuous (0=0 verifies nothing): join_anti_inactive,
    q22, and setop_except_nations all carried green-but-empty records for
    two rounds before the round-3 sweep caught them (CLAUDE.md rule 7).
    DuckDB-only, ~20 s; Spark agreement is the per-query oracle tests'
    job."""
    from tests.helpers import run_oracle

    zero = [
        name
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
        and len(run_oracle(spec.oracle, "/root/testdata/sf0.01")) == 0
    ]
    assert not zero, f"vacuous (0-row) oracles at sf0.01: {zero}"
