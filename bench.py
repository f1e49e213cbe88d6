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

    # warm the JVM + parquet footers with a trivial action, and the Python
    # worker pool + Arrow serializers with a tiny mapInPandas — otherwise
    # the first Arrow-heavy query pays ~5-8 s of daemon/fork cold-start and
    # the recorded number measures warmup, not the operator
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

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

    total = round(sum(timings.values()), 2)
    out = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    # Compact encoding (r01's pretty line overflowed the driver's capture
    # window and parsed as null); the full artifact also lands on disk so a
    # truncated stdout line can never lose the numbers again.
    line = json.dumps(out, separators=(",", ":"))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"), "w") as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
