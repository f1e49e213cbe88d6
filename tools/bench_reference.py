#!/usr/bin/env python3
"""Head-to-head throughput: the REFERENCE engine (its real manager/worker
processes, TCP control plane, GNU-sort shuffle) vs this repo's Spark mr
layer — same box, same input corpus, same mapper/reducer executables,
same M/R, byte-compared output.

BASELINE.md records that the reference publishes no numbers, so this
measures them: a word-count job (the reference's own canonical example,
submit.py defaults) over text generated from the sf0.1 documents table.

Usage: python tools/bench_reference.py [n_copies=10] [workers=4] [M=16] [R=4]

The reference runs with `workers` worker processes (its parallelism cap:
one task per worker at a time); Spark runs local[32]. That asymmetry IS
the comparison — both get the same machine, each uses it as designed.
"""
from __future__ import annotations

import hashlib
import json
import os
import pathlib
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"
WORK = "/tmp/refbench"


def build_input(n_copies: int) -> str:
    import duckdb

    inp = os.path.join(WORK, "input")
    if os.path.isdir(inp):
        shutil.rmtree(inp)
    os.makedirs(inp)
    rows = duckdb.connect().execute(
        "SELECT text FROM '/root/testdata/sf0.1/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    n_files = 16
    handles = [open(os.path.join(inp, f"input_{i:02d}.txt"), "w") for i in range(n_files)]
    i = 0
    for _ in range(n_copies):
        for (text,) in rows:
            handles[i % n_files].write(text.replace("\n", " ") + "\n")
            i += 1
    for h in handles:
        h.close()
    total = sum(os.path.getsize(os.path.join(inp, f)) for f in os.listdir(inp))
    print(f"input: {i} lines, {total/1e6:.1f} MB in {n_files} files", flush=True)
    return inp


def wait_for_parts(out_dir: str, r: int, timeout: float) -> float:
    """Wall time until R part files exist and stop growing.

    Completion requires the size tuple stable across THREE consecutive
    0.2 s polls (ADVICE r3: a reducer pausing >0.2 s between flushes used
    to end timing early and record a too-small reference_sec against a
    truncated output)."""
    t0 = time.perf_counter()
    last = None
    stable = 0
    t_stable = 0.0
    while time.perf_counter() - t0 < timeout:
        try:
            parts = sorted(
                p for p in os.listdir(out_dir) if p.startswith("part-")
            )
        except FileNotFoundError:
            parts = []
        if len(parts) >= r:
            sizes = tuple(
                os.path.getsize(os.path.join(out_dir, p)) for p in parts
            )
            # empty part files are legitimate (an md5 bucket can own zero
            # keys) — completion = all R parts present and sizes stable
            if sizes == last:
                stable += 1
                if stable == 1:
                    t_stable = time.perf_counter() - t0
                if stable >= 3:
                    # report the FIRST stable observation so the extra
                    # confirmation polls don't pad reference_sec
                    return t_stable
            else:
                stable = 0
            last = sizes
        time.sleep(0.2)
    raise TimeoutError(f"{out_dir}: {len(parts) if parts else 0}/{r} parts after {timeout}s")


def corpus_hash(out_dir: str) -> str:
    """Order-insensitive content hash over all part files."""
    lines: list[bytes] = []
    for p in sorted(os.listdir(out_dir)):
        if p.startswith("part-") and not p.endswith(".crc"):
            with open(os.path.join(out_dir, p), "rb") as fh:
                lines.extend(fh.read().splitlines())
    return hashlib.md5(b"\n".join(sorted(lines))).hexdigest()


def run_reference(inp: str, m: int, r: int, n_workers: int) -> float:
    env = dict(os.environ, PYTHONPATH=REF)
    out = os.path.join(WORK, "out_ref")
    if os.path.isdir(out):
        shutil.rmtree(out)
    procs = []
    logf = open(os.path.join(WORK, "ref.log"), "w")
    try:
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mapreduce.manager", "--port", "6000"],
            env=env, cwd=WORK, stdout=logf, stderr=logf,
        ))
        time.sleep(1.0)
        for i in range(n_workers):
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "mapreduce.worker",
                 "--port", str(6001 + i), "--manager-port", "6000"],
                env=env, cwd=WORK, stdout=logf, stderr=logf,
            ))
        time.sleep(1.5)  # registration
        t0 = time.perf_counter()
        subprocess.run(
            [sys.executable, os.path.join(REF, "mapreduce", "submit.py"),
             "--port", "6000", "--input", inp, "--output", out,
             "--mapper", os.path.join(REPO, "map_reduce_group_spark/mr/exec/wc_map.py"),
             "--reducer", os.path.join(REPO, "map_reduce_group_spark/mr/exec/wc_reduce.py"),
             "--nmappers", str(m), "--nreducers", str(r)],
            env=env, cwd=WORK, check=True, capture_output=True,
        )
        wait_for_parts(out, r, timeout=1800)
        return time.perf_counter() - t0
    finally:
        for p in procs:
            p.send_signal(signal.SIGKILL)
        logf.close()


def run_spark(inp: str, m: int, r: int) -> float:
    from pyspark.sql import SparkSession

    from map_reduce_group_spark.mr.job import Job, submit

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("mr-vs-reference")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    out = os.path.join(WORK, "out_spark")
    job = Job(
        input_directory=inp,
        output_directory=out,
        mapper_executable=os.path.join(REPO, "map_reduce_group_spark/mr/exec/wc_map.py"),
        reducer_executable=os.path.join(REPO, "map_reduce_group_spark/mr/exec/wc_reduce.py"),
        num_mappers=m,
        num_reducers=r,
    )
    # warm the JVM so we time the job, not session startup (the reference
    # timing likewise excludes manager/worker startup)
    spark.sparkContext.parallelize(range(32), 32).count()
    t0 = time.perf_counter()
    submit(spark, job)
    return time.perf_counter() - t0


def main() -> None:
    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_workers = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    r = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    os.makedirs(WORK, exist_ok=True)
    inp = build_input(n_copies)
    t_ref = run_reference(inp, m, r, n_workers)
    print(f"reference: {t_ref:.1f}s", flush=True)
    t_spark = run_spark(inp, m, r)
    print(f"spark    : {t_spark:.1f}s", flush=True)
    h_ref = corpus_hash(os.path.join(WORK, "out_ref"))
    h_spark = corpus_hash(os.path.join(WORK, "out_spark"))
    print(json.dumps({
        "workload": "wordcount", "n_copies": n_copies, "workers": n_workers,
        "M": m, "R": r,
        "reference_sec": round(t_ref, 1), "spark_sec": round(t_spark, 1),
        "speedup": round(t_ref / t_spark, 2),
        "output_match": h_ref == h_spark,
        "hash_ref": h_ref, "hash_spark": h_spark,
    }))


if __name__ == "__main__":
    main()
