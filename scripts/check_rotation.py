"""Mechanical enforcement of rotation rule #2: any query whose code
changed this round MUST be inside the driver's 50-entry CORRECTNESS
window.

The r12 verdict's "What's wrong #1": the rule lived only in prose and
was violated the first round after being re-affirmed (encode_wav_adpcm
was rewritten while q_audio_adpcm / q_audio_probe sat out of window).
This script makes the rule a check that runs in CI (tests/
test_rotation.py) and before round-close commits:

1. Diff base: the most recent driver round-marker commit
   (``round N: verdict...``) — i.e., everything this round changed —
   overridable with --base.
2. Changed engine modules: the diffed ``.py`` files under
   ``node_js_etl_processor_spark/`` (worktree included, so it catches
   uncommitted edits too).
3. Affected queries: every registry entry whose DEFINING module (via
   closure introspection of the ``_q`` wrapper) transitively imports a
   changed module. Transitivity is computed over the package's own
   import graph, so a change to a shared helper module (e.g.
   operators/multimodal.py's parse_wav_chunks, used by the audio
   decoders) correctly flags the downstream query families, not just
   the module that textually contains the query function.
4. FAIL (exit 1) if any affected query is outside the window.

A change to a truly global module (catalog.py / session.py) flags all
118 queries — more than the window holds. That is the rule working as
intended: such a change alters every plan, and the failure forces an
explicit decision recorded with --waive (each waiver names a module
and is printed into the output so the round artifacts show it was
deliberate, not forgotten).

r21 (the r20 verdict's item 1 — the r20 optimizer edited catalog.py +
7 shared modules, 84 affected queries > 50 slots, and shipped with the
--waive escape hatch never invoked because pytest's live-tree test
cannot pass CLI flags): waivers are now a COMMITTED ARTIFACT, the
ROTATION_WAIVERS file at the repo root. Each line is
``<base-commit-prefix> <module> <justification...>``; a waiver only
applies while the diff base commit matches its recorded prefix, so a
waiver recorded for this round EXPIRES automatically at the next
round marker — stale waivers cannot silently carry forward. Every
applied waiver is printed into the check output (and therefore into
the pytest log), and the round artifacts must name the compensating
verification (verify_subset re-proofs + the committed FULLVERIFY
full-registry sweep).
"""

from __future__ import annotations

import argparse
import ast
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PKG = "node_js_etl_processor_spark"
WINDOW = 50


def round_marker_base() -> str:
    """Most recent driver round-marker commit — the round boundary."""
    out = subprocess.run(
        ["git", "log", "--grep", r"^round [0-9]\+: verdict", "-n", "1",
         "--format=%H"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()
    if not out:
        raise SystemExit("no round-marker commit found; pass --base")
    return out


def changed_pkg_modules(base: str) -> "set[str]":
    """Package-relative module names changed between base and the
    working tree — committed, uncommitted, AND untracked (a brand-new
    module is invisible to `git diff` but its queries changed from
    nonexistent to existing, the strongest reason to window them)."""
    out = subprocess.run(
        ["git", "diff", "--name-only", base, "--"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    out += subprocess.run(
        ["git", "ls-files", "--others", "--exclude-standard"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.splitlines()
    mods = set()
    for path in out:
        if path.startswith(PKG + "/") and path.endswith(".py"):
            mods.add(path[len(PKG) + 1 : -3].replace("/", "."))
    return mods


def package_import_graph() -> "dict[str, set[str]]":
    """module -> set of package-internal modules it imports (direct),
    built from the AST so string literals can't fool it."""
    graph: "dict[str, set[str]]" = {}
    pkg_root = os.path.join(REPO, PKG)
    for dirpath, _dirs, files in os.walk(pkg_root):
        for fname in files:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, pkg_root)[:-3].replace(os.sep, ".")
            deps: "set[str]" = set()
            tree = ast.parse(open(path).read())
            for node in ast.walk(tree):
                if isinstance(node, ast.ImportFrom):
                    if node.module and node.module.startswith(PKG):
                        base_mod = node.module[len(PKG) + 1 :] or ""
                        for alias in node.names:
                            # `from pkg.operators import audio` form
                            cand = (base_mod + "." if base_mod else "") + alias.name
                            deps.add(cand)
                        if base_mod:
                            deps.add(base_mod)
                    elif node.level:  # relative import inside the pkg
                        # level 1 = the module's own package, each
                        # further level strips one package segment.
                        # rel's last segment is the module itself, so
                        # the module's package = rel.split(".")[:-1];
                        # a level that climbs past the pkg root
                        # resolves to the root ("").
                        parts = rel.split(".")[:-1]
                        strip = node.level - 1
                        parts = parts[: max(0, len(parts) - strip)]
                        base_mod = ".".join(
                            parts + (node.module.split(".") if node.module else [])
                        )
                        if base_mod:
                            deps.add(base_mod)
                        for alias in node.names:
                            deps.add(
                                (base_mod + "." if base_mod else "") + alias.name
                            )
                elif isinstance(node, ast.Import):
                    for alias in node.names:
                        if alias.name.startswith(PKG + "."):
                            deps.add(alias.name[len(PKG) + 1 :])
            graph[rel] = deps
    # keep only names that are real package modules
    valid = set(graph)
    for mod in graph:
        graph[mod] = {d for d in graph[mod] if d in valid}
    return graph


def transitive_deps(graph: "dict[str, set[str]]", mod: str) -> "set[str]":
    seen, stack = {mod}, [mod]
    while stack:
        for dep in graph.get(stack.pop(), ()):
            if dep not in seen:
                seen.add(dep)
                stack.append(dep)
    return seen


def query_defining_modules() -> "dict[str, str]":
    """query name -> package-relative module of its implementation
    callable, extracted from the registry itself (the _q closure), so
    the mapping can never drift from what the driver actually runs."""
    import __spark_entry__ as entrymod

    out = {}
    for name, wrapped in entrymod.queries().items():
        fn = wrapped
        if getattr(wrapped, "__closure__", None):
            # r14 (advice item): resolve the cell BY NAME (`fn` is the
            # _q parameter holding the implementation callable), not
            # "last callable cell" — a second captured callable would
            # silently misattribute the query's module and under-flag.
            freevars = wrapped.__code__.co_freevars
            by_name = dict(zip(freevars, wrapped.__closure__))
            if "fn" in by_name and callable(by_name["fn"].cell_contents):
                fn = by_name["fn"].cell_contents
            else:
                cands = [
                    c.cell_contents
                    for c in wrapped.__closure__
                    if callable(c.cell_contents)
                ]
                if len(cands) != 1:
                    raise SystemExit(
                        f"check_rotation: cannot resolve implementation "
                        f"callable for query {name!r}: no 'fn' freevar and "
                        f"{len(cands)} callable cells — fix the registry "
                        f"wrapper or this resolver"
                    )
                fn = cands[0]
        mod = fn.__module__
        if mod.startswith(PKG + "."):
            out[name] = mod[len(PKG) + 1 :]
        else:
            out[name] = mod  # defined in __spark_entry__ itself
    return out


def affected_queries(
    changed: "set[str]",
    defining: "dict[str, str]",
    graph: "dict[str, set[str]]",
) -> "set[str]":
    return {
        name
        for name, mod in defining.items()
        if mod in graph and transitive_deps(graph, mod) & changed
    }


def file_waivers(base: str, path: str | None = None) -> "dict[str, str]":
    """Committed waivers from the ROTATION_WAIVERS file: module ->
    justification, ONLY for lines whose recorded base-commit prefix
    matches the current diff base (so waivers expire at the next
    round marker instead of silently persisting)."""
    path = path or os.path.join(REPO, "ROTATION_WAIVERS")
    out: "dict[str, str]" = {}
    if not os.path.exists(path):
        return out
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split(None, 2)
        if len(parts) < 2:
            continue
        prefix, mod = parts[0], parts[1]
        reason = parts[2] if len(parts) == 3 else ""
        if base.startswith(prefix):
            out[mod] = reason
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=None, help="diff base commit")
    ap.add_argument(
        "--waive", action="append", default=[],
        help="changed module to exclude (deliberate, recorded in output)",
    )
    args = ap.parse_args()

    base = args.base or round_marker_base()
    changed = changed_pkg_modules(base)
    for mod, reason in sorted(file_waivers(base).items()):
        if mod in changed:
            changed.discard(mod)
            print(f"WAIVED (ROTATION_WAIVERS): {mod} — {reason}")
    for w in args.waive:
        changed.discard(w)
        print(f"WAIVED: {w}")
    if not changed:
        print(f"OK: no engine modules changed since {base[:12]}")
        return 0

    import __spark_entry__ as entrymod

    window = list(entrymod.queries())[:WINDOW]
    defining = query_defining_modules()
    graph = package_import_graph()
    affected = affected_queries(changed, defining, graph)
    out_of_window = sorted(affected - set(window))

    print(f"base: {base[:12]}")
    print(f"changed engine modules: {sorted(changed)}")
    print(f"affected queries: {len(affected)}")
    if out_of_window:
        print("FAIL: changed-code queries OUTSIDE the driver window:")
        for name in out_of_window:
            print(f"  {name}  (defined in {defining[name]})")
        return 1
    print("OK: every changed-code query is inside the driver window")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
