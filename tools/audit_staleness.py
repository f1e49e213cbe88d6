#!/usr/bin/env python3
"""Generate STALE.json: queries whose implementation changed AFTER the round
that last recorded them green.

Why: the driver sweep records 50 CORRECTNESS rows per round. A query recorded
green in round N whose operator was rewritten in round N+1 carries a verdict
for code that no longer exists ("verdict staleness", VERDICT r3 next-round #1).
plans/__init__._reorder_registry reads STALE.json and ranks stale queries
just after never-recorded ones, so the next sweep re-records them.

Granularity is function-level for plan builders (a change to q11 in tpch.py
must not mark q1 stale) and file-level for the non-plans package modules the
builder actually references (operators/, streaming/, mr/, sources/, catalog,
functions/), transitively closed over their in-package imports. File-level
for operators is deliberate: those modules are cohesive (a rewrite of
operators/clusters.py really does invalidate dedup_clusters' old verdict).

Fingerprint(query) = sha256 over:
  - the builder function's AST-extracted source segment,
  - source segments of same-module top-level helpers it references
    (transitively within the module),
  - full file bytes of every referenced non-plans package module
    (transitive closure over in-package imports, plans.* excluded).

Historical sources come from `git show <recording-commit>:<path>` where the
recording commit is the driver's "round N" commit that added
CORRECTNESS_r0N.json (that commit contains exactly the code the sweep ran).
A file or function missing at the old commit counts as stale.

Usage: python tools/audit_staleness.py [--check]
  --check: exit 1 if STALE.json on disk differs from a fresh computation.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "map_reduce_group_spark"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def _recording_commits() -> dict[int, str]:
    """Round number -> commit hash that added CORRECTNESS_r0N.json."""
    out: dict[int, str] = {}
    for path in sorted(
        f for f in os.listdir(REPO) if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    ):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        log = _git("log", "--diff-filter=A", "--format=%H", "--", path).split()
        if log:
            out[rnd] = log[-1]
    return out


def _latest_green_round() -> dict[str, int]:
    """Query name -> latest round with a green (hash-match or no_oracle) row."""
    latest: dict[str, int] = {}
    for path in sorted(
        f for f in os.listdir(REPO) if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    ):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        try:
            rows = json.load(open(os.path.join(REPO, path)))
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            ok = isinstance(row, dict) and (
                row.get("hash_match") is True or row.get("err") == "no_oracle"
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _module_to_path(modname: str) -> str:
    """Dotted package module -> repo-relative file path."""
    rel = modname.replace(".", "/")
    for cand in (rel + ".py", rel + "/__init__.py"):
        if os.path.exists(os.path.join(REPO, cand)):
            return cand
    return rel + ".py"  # historical-only module; _read handles absence


class _Source:
    """Read file bytes either from the worktree (commit=None) or a commit."""

    def __init__(self, commit: str | None):
        self.commit = commit
        self._cache: dict[str, str | None] = {}

    def read(self, relpath: str) -> str | None:
        if relpath in self._cache:
            return self._cache[relpath]
        text: str | None
        if self.commit is None:
            try:
                text = open(os.path.join(REPO, relpath), encoding="utf-8").read()
            except OSError:
                text = None
        else:
            r = subprocess.run(
                ["git", "show", f"{self.commit}:{relpath}"],
                cwd=REPO, capture_output=True, text=True,
            )
            text = r.stdout if r.returncode == 0 else None
        self._cache[relpath] = text
        return text


def _imports(tree: ast.Module, modname: str) -> dict[str, str]:
    """Local name -> in-package dotted module it refers to (module or symbol)."""
    pkg_parts = modname.split(".")
    out: dict[str, str] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    out[(a.asname or a.name.split(".")[0])] = a.name
        elif isinstance(node, ast.ImportFrom):
            base = node.module or ""
            if node.level:  # relative import
                base_parts = pkg_parts[: len(pkg_parts) - node.level]
                base = ".".join(base_parts + ([node.module] if node.module else []))
            if not base.startswith(PKG):
                continue
            for a in node.names:
                local = a.asname or a.name
                # `from pkg.operators import dedup` -> module pkg.operators.dedup
                # `from pkg.operators.dedup import fn` -> symbol in pkg.operators.dedup
                child = f"{base}.{a.name}"
                child_path = _module_to_path(child)
                if os.path.exists(os.path.join(REPO, child_path)):
                    out[local] = child
                else:
                    out[local] = base
    return out


def _pkg_imports_of_file(text: str, modname: str) -> set[str]:
    """All in-package modules a file imports (for the transitive dep closure)."""
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return set()
    return set(_imports(tree, modname).values())


def _names_used(fn: ast.AST) -> set[str]:
    names: set[str] = set()
    for node in ast.walk(fn):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            names.add(node.value.id)
    return names


def fingerprint(src: _Source, plan_mod: str, fn_name: str) -> str | None:
    """sha256 fingerprint of a builder's implementation, or None if missing."""
    plan_path = _module_to_path(plan_mod)
    text = src.read(plan_path)
    if text is None:
        return None
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return None
    top: dict[str, ast.AST] = {
        n.name: n
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    }
    if fn_name not in top:
        return None
    imports = _imports(tree, plan_mod)

    pieces: list[str] = []
    dep_mods: set[str] = set()

    # builder + same-module helper closure (function-level)
    seen_fns: set[str] = set()
    stack = [fn_name]
    while stack:
        f = stack.pop()
        if f in seen_fns or f not in top:
            continue
        seen_fns.add(f)
        seg = ast.get_source_segment(text, top[f]) or ""
        pieces.append(f"fn:{plan_mod}.{f}\n{seg}")
        for name in _names_used(top[f]):
            if name in top:
                stack.append(name)
            elif name in imports:
                mod = imports[name]
                if not mod.startswith(f"{PKG}.plans"):
                    dep_mods.add(mod)

    # referenced non-plans package modules, file-level, transitive closure
    closed: set[str] = set()
    mod_stack = sorted(dep_mods)
    while mod_stack:
        m = mod_stack.pop()
        if m in closed or m.startswith(f"{PKG}.plans"):
            continue
        closed.add(m)
        mtext = src.read(_module_to_path(m))
        if mtext is None:
            pieces.append(f"mod:{m}\n<MISSING>")
            continue
        pieces.append(f"mod:{m}\n{mtext}")
        mod_stack.extend(_pkg_imports_of_file(mtext, m))

    h = hashlib.sha256()
    for p in sorted(pieces):
        h.update(p.encode("utf-8"))
    return h.hexdigest()


# Queries whose CONTRACT (output semantics / oracle) changed since their last
# green row — not just their implementation. Their old verdict row compared
# against a different oracle, so they must re-record with never-recorded
# priority. Maintained by hand when a round changes a query's contract;
# cleared once the next CORRECTNESS round records them green (the audit drops
# entries whose latest green round postdates the change automatically, since
# the fingerprint then matches).
RECONTRACTED: set[str] = {
    # r4: rows-only -> full-oracle upgrades (VERDICT r3 #2)
    "dedup_minhash_lsh",    # xxhash64 -> portable md5-derived 60-bit minhash
    "dedup_simhash",        # r5: 4x15-bit single-chunk -> 20x 3-of-6 chunk-triple blocking
    "embed_kmeans_assign",  # float Lloyd -> fixed-point int8 Lloyd (dist2)
    "graph_pagerank_simgraph",  # float power iteration -> fixed-point BIGINT
    "multimodal_fake_features",  # rows-only -> full oracle (hex byte math)
    "embed_ann_ivf",            # rows-only -> oracle (portable fixed-point LSH)
    "embed_ann_ivf_quantized",  # rows-only -> oracle (portable fixed-point LSH)
    "embed_cosine_neardup",     # rows-only -> oracle (portable fixed-point LSH)
    "embed_semdedup_prune",     # rows-only -> oracle (fixed-point kmeans + CC)
    # r6: rows-only -> oracle (exact top-k by CMS estimate over the merged
    # matrix — deterministic, no batch-local candidate pool; VERDICT r5 #3)
    "sketch_heavy_hitter_tokens",
    # r7: mean_surprisal display column round(double) -> 1/10000 integer
    # fixed point (ADVICE r6 #2, rule-1 exactness) — values changed
    "doc_bigram_surprisal",
}


def compute() -> dict:
    # locate every builder's (module, function) through the registry
    os.environ.setdefault("SPARK_GRAFT_NO_SPARK", "1")
    from map_reduce_group_spark.plans.registry import REGISTRY
    import map_reduce_group_spark.plans  # noqa: F401  (populate)

    commits = _recording_commits()
    latest = _latest_green_round()
    worktree = _Source(None)
    hist = {rnd: _Source(c) for rnd, c in commits.items()}

    stale: list[str] = []
    detail: dict[str, dict] = {}
    for name, spec in REGISTRY.items():
        fn = getattr(spec.builder, "__wrapped__", spec.builder)
        plan_mod, fn_name = fn.__module__, fn.__name__
        rnd = latest.get(name)
        if rnd is None or rnd not in hist:
            continue  # never recorded green: already rank-0 in the reorder
        now = fingerprint(worktree, plan_mod, fn_name)
        then = fingerprint(hist[rnd], plan_mod, fn_name)
        if now is None:
            continue  # can't resolve current source; don't flag
        if then is None or then != now:
            stale.append(name)
            detail[name] = {"recorded_round": rnd, "commit": commits[rnd][:9]}

    recontracted = sorted(
        n for n in RECONTRACTED if n in stale
    )  # a green row newer than the change clears it (fingerprint matches)

    return {
        "rounds": {f"r{r:02d}": c[:9] for r, c in sorted(commits.items())},
        "stale": sorted(stale),
        "recontracted": recontracted,
        "detail": detail,
    }


def main() -> int:
    fresh = compute()
    out_path = os.path.join(REPO, "STALE.json")
    if "--check" in sys.argv:
        try:
            on_disk = json.load(open(out_path))
        except (OSError, ValueError):
            on_disk = None
        if on_disk != fresh:
            print("STALE.json is out of date — run python tools/audit_staleness.py")
            return 1
        print(f"STALE.json fresh: {len(fresh['stale'])} stale queries")
        return 0
    with open(out_path, "w") as fh:
        json.dump(fresh, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote STALE.json: {len(fresh['stale'])} stale of {len(_latest_green_round())} recorded")
    for n in fresh["stale"]:
        print(f"  stale: {n} (last green r{fresh['detail'][n]['recorded_round']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
