#!/usr/bin/env python3
"""Identity reducer — passes the merged sorted stream through unchanged
(the reference's reducer contract imposes no aggregation requirement)."""
import sys

for line in sys.stdin:
    sys.stdout.write(line)
