#!/usr/bin/env python3
"""Word-count mapper — the reference's canonical example executable
(its CLI defaults to tests/testdata/exec/wc_map.sh, reference
submit.py:41-51). Emits ``token\t1`` per word token; tokenization contract
matches operators/text.py (lowercase, split on non-letter runs)."""
import re
import sys

for line in sys.stdin:
    for tok in re.split(r"[^a-z]+", line.lower()):
        if tok:
            sys.stdout.write(f"{tok}\t1\n")
