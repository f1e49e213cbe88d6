#!/usr/bin/env python3
"""Environment-reading mapper — parity probe for the reference's executable
contract: workers spawn executables with an inherited environment
(reference worker/__main__.py:128-133, Popen without env= overrides), so a
mapper may legitimately read configuration from env vars. Emits the value
of $MRG_TAG as the key for every input line."""
import os
import sys

tag = os.environ.get("MRG_TAG", "MISSING")
for _ in sys.stdin:
    sys.stdout.write(f"{tag}\t1\n")
