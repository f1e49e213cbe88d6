#!/usr/bin/env python3
"""Working-directory-reading mapper — parity probe for the reference's
executable contract: executables are spawned with the hosting process's
cwd (reference worker/__main__.py:128-133, Popen without cwd= override),
so a mapper may open sidecar files by RELATIVE path. Emits the content of
./.mrg_cwd_sidecar as the key for every input line."""
import sys

with open(".mrg_cwd_sidecar") as fh:
    tag = fh.read().strip() or "EMPTY"
for _ in sys.stdin:
    sys.stdout.write(f"{tag}\t1\n")
