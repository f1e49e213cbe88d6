#!/usr/bin/env python3
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON
line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a noop sink (full computation, no
serialization of results back to Python), which is how a production job
would run — write-side cost excluded, compute included.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    from map_reduce_group_spark.plans import queries
    from map_reduce_group_spark.session import get_session

    spark = get_session("mrg-spark-bench")
    qs = queries()
    # Optional heavy-subset mode (additive; VERDICT r9 #1): the sf0.1
    # fixtures are floor-bound (single-row-group files + per-query fixed
    # overheads), so parallelism work on the heavy family is unfalsifiable
    # at the default scale. Point $SPARK_GRAFT_SF_DIR at a replicated
    # multi-row-group fixture (tools/scale_fixture.py with
    # SCALE_FIXTURE_ROW_GROUP set) and name the queries to time here.
    # Unset (the driver's path), the artifact is byte-identical in shape:
    # all registered queries, same timing loop, same one-line JSON.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "")
    if subset:
        keep = {s.strip() for s in subset.split(",") if s.strip()}
        unknown = keep - set(qs)
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_QUERIES unknown: {sorted(unknown)}")
        qs = {k: v for k, v in qs.items() if k in keep}

    # host-drift self-diagnosis (VERDICT r5 #4): the pre-scan wall is a
    # fixed workload, so a drifted artifact shows an inflated prescan_sec
    # and/or a high load average without needing a second run to compare
    import socket

    load_start = os.getloadavg()
    t_warm = time.perf_counter()

    # warm the JVM + parquet footers with a trivial action, and the Python
    # worker pool + Arrow serializers with a tiny mapInPandas — otherwise
    # the first Arrow-heavy query pays ~5-8 s of daemon/fork cold-start and
    # the recorded number measures warmup, not the operator
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # Uniform-WARM convention (BASELINE.md): fully scan every fixture table
    # once before any timing, so no query's wall depends on whether an
    # earlier query happened to page its inputs in. The r4 artifact carried
    # a ±50 s same-code band (dedup_clusters 17.2 s cold vs 6.6 s warm,
    # purely by bench order); OS page cache can't be dropped without root,
    # so uniformly-warm is the reproducible state.
    from map_reduce_group_spark.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    prescan_sec = round(time.perf_counter() - t_warm, 2)

    probe_sec = _calibration_probe(spark)

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, builder in sorted(qs.items()):
        t0 = time.perf_counter()
        try:
            df = builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # one broken query must not lose the artifact
            errors[name] = (str(exc).splitlines() or [repr(exc)])[0][:200]
        # every query starts with an empty Spark-side cache: a builder that
        # persists/caches internally must not subsidize a later query
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 2)
    out = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "prescan_sec": prescan_sec,
        "probe_sec": probe_sec,
        "host": socket.gethostname(),
        "load_avg_1m": [round(load_start[0], 2), round(os.getloadavg()[0], 2)],
    }
    if errors:
        out["errors"] = errors
    # Full artifact always lands on disk (subset runs write a sibling file so
    # a measurement session never clobbers the driver-shaped artifact).
    full = json.dumps(out, separators=(",", ":"))
    artifact = "BENCH_subset.json" if subset else "BENCH.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), artifact), "w") as fh:
        fh.write(full + "\n")

    print(compact_line(out, timings, errors))


def _calibration_probe(spark) -> dict[str, float]:
    """Fixed synthetic calibration workload (VERDICT r8 #2): three pinned
    probes exercising the three cost regimes every registered query is
    built from — JVM whole-stage-codegen compute, shuffle machinery, and
    the Python/Arrow worker path. The workload is data-independent and
    MUST NEVER CHANGE once shipped: its wall on a quiet host is a known
    constant (see SCALING.md round-9 calibration), so any bench artifact's
    host-noise factor is computable as probe_total / quiet_floor without
    needing a second same-code run. Runs after the uniform-warm prescan so
    it measures steady-state, not JVM/daemon cold-start."""
    probes: dict[str, float] = {}
    t0 = time.perf_counter()
    # jvm: hash-aggregate over 200M codegen'd rows, zero shuffle rows moved
    spark.range(0, 200_000_000, 1, 32).selectExpr(
        "bit_xor(xxhash64(id)) AS h"  # overflow-free under ANSI mode
    ).write.format("noop").mode("overwrite").save()
    probes["jvm"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    # shuffle: 20M rows through a 100k-key exchange + final aggregate
    spark.range(0, 20_000_000, 1, 32).selectExpr(
        "id % 100000 AS k", "id AS v"
    ).groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
    probes["shuffle"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    # arrow: 2M rows through the Python worker pool in 32 Arrow batches
    spark.range(0, 2_000_000, 1, 32).mapInPandas(
        lambda it: (pdf.assign(id=pdf["id"] * 2 + 1) for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    probes["arrow"] = round(time.perf_counter() - t0, 2)
    probes["total"] = round(sum(probes.values()), 2)
    return probes


def compact_line(
    out: dict, timings: dict[str, float], errors: dict[str, str], limit: int = 1800
) -> str:
    """The driver keeps only the LAST 2000 bytes of stdout; a 131-query map
    is ~4 KB, so the head ("metric","value") gets cut and parses as null
    (BENCH_r01 AND r02). Build a trimmed line, shrinking the slowest-N map
    until the whole line fits well inside the capture window."""
    out = dict(out)
    slow = sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    n = 20
    while True:
        out["queries"] = {k: round(v, 1) for k, v in slow[:n]}
        out["n_queries_total"] = len(timings)
        if errors:
            out["errors"] = {k: v[:60] for k, v in list(errors.items())[:3]}
            out["n_errors"] = len(errors)
        line = json.dumps(out, separators=(",", ":"))
        if len(line) <= limit or n == 0:
            break
        n -= 2
    return line


if __name__ == "__main__":
    main()
