#!/usr/bin/env python3
"""Word-count reducer — relies on the engine's grouping guarantee (all
lines for a key arrive contiguously, sorted; SURVEY §1.4), exactly like the
reference's reducer contract (worker/__main__.py:174-181)."""
import itertools
import sys

for key, group in itertools.groupby(sys.stdin, key=lambda line: line.split("\t", 1)[0]):
    total = sum(int(line.rstrip("\n").split("\t", 1)[1]) for line in group)
    sys.stdout.write(f"{key}\t{total}\n")
