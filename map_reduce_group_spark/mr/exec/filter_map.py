#!/usr/bin/env python3
"""Filter mapper: emits `len\tline` only for lines containing 'spark' —
demonstrates the 0-or-1 fan-out (filter) contract of the reference's map
stage (reference worker/__main__.py:137-144 allows any fan-out incl. 0)."""
import sys

for line in sys.stdin:
    line = line.rstrip("\n")
    if "spark" in line:
        sys.stdout.write(f"{len(line):05d}\t{line}\n")
