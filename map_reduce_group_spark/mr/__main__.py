"""CLI job submission — the reference's ``mapreduce-submit`` surface
(reference submit.py:21-60: --input/--output/--mapper/--reducer/
--nmappers/--nreducers), executed on Spark instead of a manager/worker
cluster. No host/port: there is no socket control plane to talk to
(SURVEY §3.4 — submission IS execution of one Spark action).

Usage:
    python -m map_reduce_group_spark.mr \
        --input tests/testdata/input --output out \
        --mapper wc_map.py --reducer wc_reduce.py \
        --nmappers 2 --nreducers 2
"""

from __future__ import annotations

import argparse
import os

from map_reduce_group_spark.mr.job import Job, submit
from map_reduce_group_spark.session import get_session

_EXEC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exec")


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        prog="map_reduce_group_spark.mr", description=__doc__
    )
    # defaults mirror the reference CLI's word-count defaults (submit.py:31-58)
    ap.add_argument("--input", "-i", default="tests/testdata/input")
    ap.add_argument("--output", "-o", default="output")
    ap.add_argument("--mapper", "-m", default=os.path.join(_EXEC_DIR, "wc_map.py"))
    ap.add_argument("--reducer", "-r", default=os.path.join(_EXEC_DIR, "wc_reduce.py"))
    ap.add_argument("--nmappers", type=int, default=2)
    ap.add_argument("--nreducers", type=int, default=2)
    args = ap.parse_args(argv)

    spark = get_session("mrg-spark-submit")
    submit(
        spark,
        Job(
            input_directory=args.input,
            output_directory=args.output,
            mapper_executable=args.mapper,
            reducer_executable=args.reducer,
            num_mappers=args.nmappers,
            num_reducers=args.nreducers,
        ),
    )
    print(f"job complete: {args.output}")


if __name__ == "__main__":
    main()
