"""Query plans — importing this package populates the registry.

Enumeration order matters: the external driver sweeps the first N registry
entries per round (r01 recorded exactly the first 50 of 80), so after the
plan modules register everything we reorder the registry to put queries
with the fewest recorded CORRECTNESS rows first. Over rounds this rotates
the sweep window across the whole surface; the sort is deterministic
(tie-break = original registration order), so repeated runs in one round
see an identical ordering.
"""

import glob as _glob
import json as _json
import os as _os

from map_reduce_group_spark.plans import (  # noqa: F401
    advanced,
    events,
    llm,
    mrplans,
    relational,
    sketchplans,
    streamplans,
    tpch,
    tpch2,
    windows,
)
from map_reduce_group_spark.plans.registry import REGISTRY, oracles, queries


def _recorded_counts() -> dict[str, int]:
    """How many driver CORRECTNESS rounds have recorded each query name."""
    repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    counts: dict[str, int] = {}
    for path in sorted(_glob.glob(_os.path.join(repo, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = _json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            # only a GREEN row counts as recorded: errored rows prove nothing,
            # and a HASH_FAIL/rows-mismatch row (err=None, hash_match=False)
            # needs a retest after its fix lands (q12 sat outside the front 50
            # in r2 because err=None counted it as covered)
            ok = isinstance(row, dict) and (
                row.get("hash_match") is True or row.get("err") == "no_oracle"
            )
            counts[name] = counts.get(name, 0) + (1 if ok else 0)
    return counts


def _stale_names() -> dict[str, int]:
    """Queries whose implementation changed after their last green round.

    tools/audit_staleness.py fingerprints each builder (function-level) plus
    its referenced operator modules against the recording round's commit and
    writes STALE.json; a stale green row is a verdict for code that no longer
    exists (VERDICT r3 #1), so the sweep must re-record it. Returns
    name -> recorded_round (missing file => nothing stale)."""
    repo = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    try:
        with open(_os.path.join(repo, "STALE.json")) as fh:
            data = _json.load(fh)
        stale = {n: int(data["detail"][n]["recorded_round"]) for n in data.get("stale", [])}
        # contract-changed queries (oracle/output semantics, not just impl)
        # rank with never-recorded: their old green row compared against a
        # DIFFERENT oracle, so it proves nothing about the current contract
        for n in data.get("recontracted", []):
            stale[n] = -1
        return stale
    except (OSError, ValueError, KeyError, TypeError):
        return {}


def _reorder_registry() -> None:
    """Sweep-priority order for the driver's 50-slot-per-round window:

    1. never-recorded queries (a new query's first verdict beats everything);
    2. stale queries — oldest recording round first, then HIGHEST cost hint
       first: the expensive queries are precisely the rewritten operators
       (mr pipe, dedup_clusters, corpus pipelines) whose re-verification the
       staleness pass exists for, while the cheap stale tail is mostly
       incidental shared-module drift that can wait a round;
    3. everything else, least-recorded then cheapest, so a time-budgeted
       sweep still maximizes fresh coverage before it truncates."""
    from map_reduce_group_spark.plans.registry import COST_HINT

    seen = _recorded_counts()
    stale = _stale_names()
    order = {name: i for i, name in enumerate(REGISTRY)}

    def key(n: str):
        if seen.get(n, 0) == 0:
            return (0, 0, COST_HINT.get(n, 0.0), order[n])
        if n in stale:
            return (1, stale[n], -COST_HINT.get(n, 0.0), order[n])
        return (2, seen[n], COST_HINT.get(n, 0.0), order[n])

    for name in sorted(REGISTRY, key=key):
        REGISTRY[name] = REGISTRY.pop(name)


_reorder_registry()

__all__ = ["REGISTRY", "oracles", "queries"]
