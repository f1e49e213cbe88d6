"""Reference-parity E2E tests for the MR job API (SURVEY §5.1 test style:
end-to-end word-count job over a text corpus, golden output check), plus
the partition/sort invariants of SURVEY §1.4."""

from __future__ import annotations

import hashlib
import os
from collections import Counter

import pytest

from map_reduce_group_spark.mr import Job, submit
from map_reduce_group_spark.mr.job import pipe_table

EXEC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "map_reduce_group_spark",
    "mr",
    "exec",
)
WORDS = ["hello", "world", "spark", "graft", "map", "reduce", "shuffle"]


@pytest.fixture()
def corpus(tmp_path):
    inp = tmp_path / "input"
    inp.mkdir()
    golden: Counter = Counter()
    for f in range(4):
        lines = []
        for i in range(100):
            a, b = WORDS[(i * 7 + f) % 7], WORDS[(i * 3 + f) % 7]
            lines.append(f"{a} {b}")
            golden[a] += 1
            golden[b] += 1
        (inp / f"file{f}.txt").write_text("\n".join(lines) + "\n")
    return str(inp), str(tmp_path / "output"), golden


def _read_output(out_dir: str) -> dict[str, int]:
    got: dict[str, int] = {}
    for pf in sorted(os.listdir(out_dir)):
        if pf.startswith("part-"):
            for line in open(os.path.join(out_dir, pf)):
                w, n = line.rstrip("\n").split("\t")
                got[w] = int(n)
    return got


def test_wordcount_job_golden(spark, corpus):
    inp, out, golden = corpus
    job = Job(inp, out, f"{EXEC_DIR}/wc_map.py", f"{EXEC_DIR}/wc_reduce.py", 2, 2)
    submit(spark, job)
    assert _read_output(out) == dict(golden)


def test_partition_and_sort_invariants(spark, corpus):
    """The reference's observable semantics (SURVEY §1.4): every key routed
    by md5 % R, lines sorted within each part file."""
    inp, out, _ = corpus
    r = 3
    job = Job(inp, out, f"{EXEC_DIR}/wc_map.py", f"{EXEC_DIR}/wc_reduce.py", 2, r)
    submit(spark, job)
    part_files = [f for f in sorted(os.listdir(out)) if f.startswith("part-")]
    assert len(part_files) == r
    for pf in part_files:
        lines = open(os.path.join(out, pf)).read().splitlines()
        assert lines == sorted(lines), f"{pf} not sorted"
        pid = int(pf.split("-")[1])
        for line in lines:
            key = line.split("\t", 1)[0]
            assert int(hashlib.md5(key.encode()).hexdigest(), 16) % r == pid


def test_overwrite_semantics(spark, corpus):
    inp, out, golden = corpus
    job = Job(inp, out, f"{EXEC_DIR}/wc_map.py", f"{EXEC_DIR}/wc_reduce.py", 2, 2)
    submit(spark, job)
    submit(spark, job)  # rerun must overwrite, not fail or append
    assert _read_output(out) == dict(golden)


def test_pipe_table_roundtrip(spark, sf_dir):
    """DataFrame-level executable escape hatch: pipe rows through `cat`."""
    from map_reduce_group_spark.catalog import load_table

    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    back = pipe_table(nation, "cat", "n_nationkey string, n_name string")
    got = sorted((int(r[0]), r[1]) for r in back.collect())
    want = sorted((r[0], r[1]) for r in nation.collect())
    assert got == want


def test_filter_job_arbitrary_executables(spark, corpus):
    """A second executable pair (grep-style filter mapper + identity
    reducer): the job API is generic over programs, not just word count."""
    inp, out, _ = corpus
    job = Job(inp, out, f"{EXEC_DIR}/filter_map.py", f"{EXEC_DIR}/identity_reduce.py", 2, 2)
    submit(spark, job)
    lines = []
    for pf in sorted(os.listdir(out)):
        if pf.startswith("part-"):
            lines += open(os.path.join(out, pf)).read().splitlines()
    n_spark_lines = sum(
        1
        for f in os.listdir(inp)
        for line in open(os.path.join(inp, f))
        if "spark" in line
    )
    assert len(lines) == n_spark_lines > 0
    assert all("spark" in line for line in lines)


def test_cli_submission(corpus, tmp_path):
    """The reference's CLI surface: python -m map_reduce_group_spark.mr."""
    import subprocess
    import sys

    inp, out, golden = corpus
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [
            sys.executable, "-m", "map_reduce_group_spark.mr",
            "--input", inp, "--output", out,
            "--nmappers", "2", "--nreducers", "2",
        ],
        cwd=repo,
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert _read_output(out) == dict(golden)
