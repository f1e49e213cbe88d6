#!/usr/bin/env python3
"""Generate STALE.json: queries whose implementation changed AFTER the round
that last recorded them green.

Why: the driver sweep records 50 CORRECTNESS rows per round. A query recorded
green in round N whose operator was rewritten in round N+1 carries a verdict
for code that no longer exists ("verdict staleness", VERDICT r3 next-round #1).
plans/__init__._reorder_registry reads STALE.json and ranks stale queries
just after never-recorded ones, so the next sweep re-records them.

Granularity is SYMBOL-level everywhere (VERDICT r7 next-round #1b): a change
to one function in operators/text.py no longer stales the 15 unrelated
queries that import other functions from the same file. The fingerprint of a
query is the sha256 over the source segments of:

  - the builder function INCLUDING its decorators — the @register(...)
    decorator carries the DuckDB oracle SQL, so an oracle-only edit now
    correctly stales the row (it was invisible to the r1-r7 audits);
  - every top-level symbol (function / class / assignment) the builder
    references, transitively, across package modules: symbol imports
    (`from ..operators.text import fingerprint`) resolve to that one
    function's closure; module imports (`... import text` + `text.foo(...)`)
    resolve per attribute accessed;
  - module-level constants a referenced function reads (they are top-level
    assignments, so they join the closure like functions do);
  - conservative whole-module fallbacks where symbol resolution is not
    sound: a module object used bare (passed around / getattr'd) or an
    unresolvable symbol hashes the ENTIRE module plus its transitive
    in-package import closure — exactly the pre-r8 file-level behavior.

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
    return rel + ".py"  # historical-only module; _Source.read handles absence


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


def _resolve_imports(tree: ast.Module, modname: str) -> dict[str, tuple[str, str | None]]:
    """Local name -> (in-package dotted module, symbol-or-None).

    symbol=None means the local name is bound to a MODULE object
    (`from pkg.operators import text`); a string means it is bound to one
    symbol inside that module (`from pkg.operators.text import fingerprint`).
    Function-local imports are included (ast.walk covers nested bodies) —
    builders routinely import operators inside the function body.
    """
    pkg_parts = modname.split(".")
    out: dict[str, tuple[str, str | None]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    out[(a.asname or a.name.split(".")[0])] = (a.name, None)
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
                # `from pkg.operators.dedup import fn` -> symbol fn of that module
                child = f"{base}.{a.name}"
                if os.path.exists(os.path.join(REPO, _module_to_path(child))):
                    out[local] = (child, None)
                else:
                    out[local] = (base, a.name)
    return out


def _uses(node: ast.AST) -> tuple[dict[str, set[str]], set[str]]:
    """(attrs accessed per base name, bare name uses) inside ``node``.

    `text.repetition_signals(...)` records attrs["text"] ⊇ {"repetition_signals"}
    without counting `text` as a bare use; `do(text)` counts `text` bare —
    the caller then falls back to whole-module hashing for that binding.
    """
    attrs: dict[str, set[str]] = {}
    bare: set[str] = set()

    def visit(n: ast.AST) -> None:
        if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            attrs.setdefault(n.value.id, set()).add(n.attr)
            for child in ast.iter_child_nodes(n):
                if child is not n.value:
                    visit(child)
            return
        if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Attribute):
            # multi-level chain `a.b.c` (ADVICE r8 #4): one attr level
            # cannot address a chained symbol — recording attrs["a"]={"b"}
            # would drop the leaf and can under-resolve a from-imported
            # module object. Record the ROOT as a BARE use so the binding
            # always takes the conservative whole-module path.
            base: ast.AST = n.value
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                bare.add(base.id)
                for child in ast.iter_child_nodes(n):
                    if child is not n.value:
                        visit(child)
                return
            # chain rooted in a call/subscript: fall through to generic
        if isinstance(n, ast.Name):
            bare.add(n.id)
            return
        for child in ast.iter_child_nodes(n):
            visit(child)

    visit(node)
    return attrs, bare


class _ModView:
    """Parsed top-level view of one module at one source snapshot."""

    def __init__(self, src: _Source, modname: str):
        self.modname = modname
        self.text = src.read(_module_to_path(modname))
        self.ok = False
        self.top: dict[str, ast.AST] = {}
        self.imports: dict[str, tuple[str, str | None]] = {}
        if self.text is None:
            return
        try:
            tree = ast.parse(self.text)
        except SyntaxError:
            return
        self.ok = True
        for n in tree.body:
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.top[n.name] = n
            elif isinstance(n, ast.Assign):
                for t in n.targets:
                    if isinstance(t, ast.Name):
                        self.top[t.id] = n
            elif isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
                self.top[n.target.id] = n
        self.imports = _resolve_imports(tree, modname)
        self._import_closure: set[str] | None = None

    def segment(self, node: ast.AST) -> str:
        """Source of a top-level symbol INCLUDING decorators (@register
        carries the oracle SQL — it must be part of the fingerprint)."""
        parts = [
            "@" + (ast.get_source_segment(self.text, d) or "")
            for d in getattr(node, "decorator_list", []) or []
        ]
        parts.append(ast.get_source_segment(self.text, node) or "")
        return "\n".join(parts)

    def pkg_import_closure(self) -> set[str]:
        """All in-package modules this file imports (one hop; callers close)."""
        return {m for m, _sym in self.imports.values()}


def _is_plans(mod: str) -> bool:
    return mod.startswith(f"{PKG}.plans")


# Harness plumbing shared by EVERY query: the @register decorator body and the
# session-conf applier. Their edits are round-global events (every row would
# flag at once, pure noise) — when such a change actually alters semantics it
# is a contract change and belongs in RECONTRACTED. The decorator's SOURCE
# TEXT (query name + oracle SQL) is still fingerprinted via segment().
INFRA_MODULES = {f"{PKG}.plans.registry", f"{PKG}.session"}


def fingerprint(src: _Source, plan_mod: str, fn_name: str) -> str | None:
    """sha256 fingerprint of a builder's implementation, or None if missing.

    Symbol-level closure across the whole package; whole-module conservative
    fallback (plus that module's transitive in-package import closure) where
    resolution is unsound. Piece assembly is order-independent: symbols from
    whole-hashed modules are dropped at the end, and a module entering the
    whole set always drags its full import closure, so the discovered piece
    set does not depend on traversal order.
    """
    views: dict[str, _ModView] = {}

    def view(m: str) -> _ModView:
        if m not in views:
            views[m] = _ModView(src, m)
        return views[m]

    root = view(plan_mod)
    if not root.ok or fn_name not in root.top:
        return None

    segs: dict[tuple[str, str], str] = {}
    whole: set[str] = set()  # modules hashed in full (conservative fallback)
    done: set[tuple[str, str]] = set()

    def add_whole(mod: str) -> None:
        """Whole-module hash + transitive in-package import closure (the
        pre-r8 file-level behavior). plans modules never go whole — the
        root builder is symbol-level by design and plans files are huge."""
        stack = [mod]
        while stack:
            m = stack.pop()
            if m in whole or _is_plans(m) or m in INFRA_MODULES:
                continue
            whole.add(m)
            v = view(m)
            if v.ok:
                stack.extend(v.pkg_import_closure())

    stack: list[tuple[str, str]] = [(plan_mod, fn_name)]
    while stack:
        mod, sym = stack.pop()
        if (mod, sym) in done or mod in INFRA_MODULES:
            continue
        done.add((mod, sym))
        v = view(mod)
        if not v.ok:
            segs[(mod, sym)] = "<MISSING-MODULE>"
            continue
        if sym not in v.top:
            if sym in v.imports:  # re-export: follow the import
                tmod, tsym = v.imports[sym]
                if tsym is None:
                    add_whole(tmod)  # re-exported module object
                else:
                    stack.append((tmod, tsym))
                continue
            # unresolvable symbol: plans -> marker; others -> whole module
            if _is_plans(mod):
                segs[(mod, sym)] = "<UNRESOLVED>"
            else:
                add_whole(mod)
            continue
        node = v.top[sym]
        segs[(mod, sym)] = v.segment(node)
        attrs, bare = _uses(node)
        for base, anames in attrs.items():
            if base in v.top:
                stack.append((mod, base))
            elif base in v.imports:
                tmod, tsym = v.imports[base]
                if tsym is None:  # module binding: per-attribute resolution
                    stack.extend((tmod, a) for a in sorted(anames))
                else:  # attribute on an imported object
                    stack.append((tmod, tsym))
        for n in bare:
            if n == sym:
                continue
            if n in v.top:
                stack.append((mod, n))
            elif n in v.imports:
                tmod, tsym = v.imports[n]
                if tsym is None:
                    add_whole(tmod)  # module object used bare: conservative
                else:
                    stack.append((tmod, tsym))

    pieces = [f"mod:{m}\n{view(m).text if view(m).ok else '<MISSING>'}" for m in whole]
    pieces += [
        f"sym:{m}.{s}\n{seg}" for (m, s), seg in segs.items() if m not in whole
    ]
    h = hashlib.sha256()
    for p in sorted(pieces):
        h.update(p.encode("utf-8"))
        h.update(b"\x00")
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
    # r8: last two F.round-on-double display columns -> 1/10000 integer
    # fixed point (VERDICT r7 #2, rule-1) — values changed
    "doc_repetition_signals",
    "doc_token_rarity",
    # r9: repo-wide retirement of the F.round-on-double presentation class
    # (VERDICT r8 #1): integer ratios -> fp_ratio (1/10^6 or 1/10^4 integer
    # div), irreducibly-float displays -> fp_floor (engine-symmetric floor)
    # — display values changed on every query below
    "doc_token_stats",
    "doc_quality_score",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_containment",
    "dedup_jaccard_prefix",
    "dedup_jaccard_topmatch",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_incremental_minhash",
    "stream_incremental_minhash",
    "corpus_span_dedup",
    "corpus_contamination_check",
    "corpus_mixture_rebalance",
    "corpus_mixture_temperature",
    "corpus_train_val_split",
    "window_distribution_functions",
    "scalar_array_ops",
    "embed_random_projection",
    # r9: classifier score BIGINT -> exact-decimal-string double
    # (ADVICE r8 #1 — silent-NULL-on-overflow class): dtype changed
    "doc_quality_classifier",
}

# VERDICT r7 next-round #1 requires the r8 sweep to re-record ALL 35 rows the
# r7 (file-level) audit flagged, even where the refined symbol-level
# fingerprint proves a row's closure never actually changed. Pinned rows stay
# stale until a green driver row from round >= the pin round lands; then the
# pin is inert (self-clearing).
PINNED: dict[str, int] = {name: 8 for name in [
    "corpus_data_card", "corpus_sequence_pack", "corpus_token_gini",
    "dedup_containment", "dedup_exact_fingerprint", "dedup_incremental_minhash",
    "dedup_minhash_lsh_capped", "doc_bpe_merges64", "doc_lang_id",
    "doc_ngram_novelty", "doc_pii_scrub", "doc_quality_score",
    "doc_repetition_signals", "doc_token_rarity", "doc_token_stats",
    "doc_winnow_fingerprints", "embed_cohort_drift", "embed_quantize_int8",
    "embed_random_projection", "embed_rank_fusion", "multimodal_binary_meta",
    "multimodal_bmp_ahash_groups", "multimodal_bmp_decode",
    "multimodal_video_frame_sample", "multimodal_wav_decode",
    "multimodal_wav_frame_energy", "pipeline_corpus_prep_v2",
    "sample_stratified_cap", "sample_weighted_tokens", "stream_cms_cells",
    "stream_hll_cardinality", "text_lang_confusion",
    "text_source_bigram_overlap", "text_tfidf_top_terms",
    "text_topk_bigrams_by_lang",
]}


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
        if name in PINNED and rnd < PINNED[name]:
            stale.append(name)
            detail[name] = {
                "recorded_round": rnd, "commit": commits[rnd][:9], "pinned": True,
            }
            continue
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
        pin = " [pinned]" if fresh["detail"][n].get("pinned") else ""
        print(f"  stale: {n} (last green r{fresh['detail'][n]['recorded_round']}){pin}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
