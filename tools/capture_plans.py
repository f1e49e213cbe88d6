#!/usr/bin/env python3
"""Capture .explain("formatted") for named registered queries into
plans/r10/<name>_<tag>.txt (the optimization round's plan evidence).

Usage: python tools/capture_plans.py TAG name [name ...] [--sf DIR] [--out DIR]
Run from the tree whose plans you want (a worktree at the pre-change commit
for TAG=before, HEAD for TAG=after).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

tag, names, sf, out = sys.argv[1], [], "/root/testdata/sf0.1", None
_argv = sys.argv[2:]
i = 0
while i < len(_argv):
    if _argv[i] == "--sf":
        sf = _argv[i + 1]
        i += 2
    elif _argv[i] == "--out":
        out = _argv[i + 1]
        i += 2
    else:
        names.append(_argv[i])
        i += 1
out = out or os.path.join(REPO, "plans", "r10")
os.makedirs(out, exist_ok=True)

from map_reduce_group_spark.plans import queries
from map_reduce_group_spark.session import get_session

spark = get_session("plan-capture")
qs = queries()
for name in names:
    df = qs[name](spark, sf)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    path = os.path.join(out, f"{name}_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(txt)
    print(f"{name} -> {path} ({len(txt)} bytes)")
