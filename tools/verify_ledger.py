"""Churn-aware driver-verification ledger (r8 verdict item 1).

The driver value-hashes ~50 catalog queries per round, taken from the
head of `all_queries()` iteration order (`plans/catalog._PRIORITY`).
Every query has been value-proven at least once across r1-r8, but code
keeps changing under long-stable queries — a query whose
implementation changed AFTER its last green driver row is silently
unverified until the driver's window reaches it again.

This tool derives, from artifacts already in the repo:

  per query:  last round with a green driver value-hash
              (CORRECTNESS_r0*.json), and whether its implementation
              changed since then (git, against the `round N:` boundary
              commit that recorded the green row)

and prints the recommended `_PRIORITY` head ordering:

  rank 0  never driver-verified (new queries)
  rank 1  own catalog block / pinned oracle / operator-module changed
          since last green row  (direct churn)
  rank 2  shared infra (sources/tables.py, session.py) changed since
          last green row  (indirect churn — everything reads tables)
  rank 3  stale only (no churn) — oldest green first

within a rank: oldest last-green round first.

"Implementation" of a query =
  - its own @_q block in plans/catalog.py (decorator incl. oracle SQL
    + builder function), extracted textually from the historical blob
    so unrelated catalog.py growth does NOT count as churn;
  - its pinned VALUES oracle block in plans/pinned.py, if any;
  - every engine module its block references (operator-alias usage
    `D./S./TX./R.` and `from reactionetl_etl_spark.x.y import` lines).

Usage:
    python tools/verify_ledger.py            # human table + summary
    python tools/verify_ledger.py --priority # ready-to-paste names
    python tools/verify_ledger.py --json     # machine-readable ledger
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CATALOG_REL = "reactionetl_etl_spark/plans/catalog.py"
PINNED_REL = "reactionetl_etl_spark/plans/pinned.py"

# catalog.py module aliases → engine module files
ALIAS_FILES = {
    "D": "reactionetl_etl_spark/operators/dedup.py",
    "S": "reactionetl_etl_spark/operators/similarity.py",
    "TX": "reactionetl_etl_spark/operators/text.py",
    "R": "reactionetl_etl_spark/operators/relational.py",
}
# files every query depends on (table loaders, session config): churn
# here is real but indirect, so it ranks BELOW direct block churn.
# The names every query actually reaches in each file — the rank-2
# check is function-level (effective sources, r10) like rank 1, so a
# tables.py edit that never touches the loaders does not re-flag all
# 270+ queries.
SHARED_FILES = {
    "reactionetl_etl_spark/sources/tables.py": {"load_table", "load_events"},
    "reactionetl_etl_spark/session.py": {"get_spark"},
}


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def last_green_rounds() -> dict[str, int]:
    """query → max round whose CORRECTNESS_r{N}.json shows a green
    value-hash (rows+schema+hash all true). Rows-only greens do not
    count as value verification."""
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
                out[name] = max(out.get(name, 0), rnd)
    return out


def round_boundary_commits() -> dict[int, str]:
    """round N → the `round N: verdict/...` commit that recorded its
    CORRECTNESS file. The driver verified the tree as of that commit."""
    out: dict[int, str] = {}
    log = _git("log", "--format=%H %s")
    for line in log.splitlines():
        sha, _, subj = line.partition(" ")
        m = re.match(r"round (\d+):", subj)
        if m:
            out.setdefault(int(m.group(1)), sha)  # newest occurrence wins
    return out


def catalog_blocks(text: str) -> dict[str, str]:
    """query name → its @_q block (decorator + builder) from a
    catalog.py source text. Blocks start at a column-0 `@_q(` and run
    to the next column-0 `@_q(`, `def `, class or module-level
    assignment."""
    lines = text.splitlines()
    starts = [i for i, ln in enumerate(lines) if ln.startswith("@_q(")]
    out: dict[str, str] = {}
    for idx, s in enumerate(starts):
        e = starts[idx + 1] if idx + 1 < len(starts) else len(lines)
        block = "\n".join(lines[s:e]).rstrip()
        m = re.search(r'@_q\(\s*\n?\s*"([^"]+)"', block)
        if m:
            out[m.group(1)] = block
    return out


def pinned_blocks(text: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in re.finditer(
        r'PINNED_ORACLES\["([^"]+)"\]\s*=\s*"""(.*?)"""', text, re.DOTALL
    ):
        out[m.group(1)] = m.group(2)
    return out


def block_module_deps(block: str) -> dict[str, set[str]]:
    """module file → the top-level names the block uses from it.

    An empty name set means "used, but the specific names could not be
    determined" — treated as depending on the WHOLE module.

    Import-name capture is line-anchored (parenthesized imports matched
    separately) so identifiers from the statements following an import
    are never swallowed into the used-name set; and `from PKG import
    submodule` (e.g. `from ...operators import linalg as LA`) resolves
    to PKG/submodule.py when PKG is a package — mapping it to the
    nonexistent PKG.py would make churn in that module permanently
    invisible."""
    deps: dict[str, set[str]] = {}
    whole_module: set[str] = set()

    def add(path: str, names: set[str]) -> None:
        deps[path] = deps.get(path, set()) | names

    for alias, path in ALIAS_FILES.items():
        names = set(re.findall(rf"\b{alias}\.(\w+)", block))
        if names:
            add(path, names)
    imports = re.findall(
        r"from\s+(reactionetl_etl_spark[\w.]*)\s+import\s+"
        r"(\([^)]*\)|[^\n(]+)",
        block,
    )
    for pkg, what in imports:
        # strip comments BEFORE splitting: `import tokenize  # markers`
        # must capture 'tokenize', not 'tokenize  # markers' (a bogus
        # name can never match an effective source -> invisible churn)
        raw = "\n".join(ln.split("#", 1)[0] for ln in what.splitlines())
        raw = raw.strip().strip("()")
        names = {
            n.strip().split(" as ")[0].strip()
            for n in raw.split(",")
            if n.strip()
        }
        base = pkg.replace(".", "/")
        if os.path.exists(os.path.join(REPO, base + ".py")):
            add(base + ".py", names)
            continue
        # PKG is a package: each imported name may be a submodule file
        for n in names:
            sub = f"{base}/{n}.py"
            if os.path.exists(os.path.join(REPO, sub)):
                # whole-module dependency (the block's usage goes
                # through the submodule alias — not resolvable to names)
                deps.setdefault(sub, set())
                whole_module.add(sub)
            else:
                # name re-exported through the package __init__: depend
                # on the WHOLE __init__ (empty name set). A named dep
                # would be blind — effective_sources skips import
                # statements, so an import-only __init__ has no named
                # entries and a rewired re-export would never flag.
                deps.setdefault(base + "/__init__.py", set())
                whole_module.add(base + "/__init__.py")
    for path in whole_module:
        deps[path] = set()
    return deps


# keyed by the module TEXT itself (texts are already held alive by the
# callers, so an int key buys no memory and adds a collision mode)
_EFF_CACHE: dict[str, dict[str, str] | None] = {}


def effective_sources(text: str) -> dict[str, str] | None:
    """Top-level name → EFFECTIVE source: its own statement plus,
    transitively, every other top-level statement it references —
    the unit of churn a caller of that name can actually observe.

    Module-level churn flagged every query touching a module even when
    the edit was confined to functions the query never calls (r10:
    three similarity.py functions changed → all 20 similarity queries
    re-flagged). Function-level effective sources keep the flag
    conservative (a changed shared helper or constant propagates to
    every function that uses it) while unflagging genuinely untouched
    paths. Returns None when the text does not parse (→ caller falls
    back to module-level). Memoized on the text: a hot module like
    similarity.py is consulted by ~20 queries per ledger build, and
    re-parsing per (query, dep) pair would make the round artifact
    O(queries × deps) ast work."""
    import ast

    if text in _EFF_CACHE:
        return _EFF_CACHE[text]

    try:
        tree = ast.parse(text)
    except SyntaxError:
        _EFF_CACHE[text] = None
        return None
    stmts: dict[str, tuple[str, set[str]]] = {}
    import_srcs: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            import_srcs.append(ast.get_source_segment(text, node) or "")
            continue
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names = {node.name}
            src_parts = [ast.get_source_segment(text, d) or "" for d in node.decorator_list]
            src_parts.append(ast.get_source_segment(text, node) or "")
            src = "\n".join(src_parts)
        elif isinstance(node, ast.Assign):
            names = {t.id for t in node.targets if isinstance(t, ast.Name)}
            src = ast.get_source_segment(text, node) or ""
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            names = {node.target.id}
            src = ast.get_source_segment(text, node) or ""
        else:
            continue
        refs = {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
        for nm in names:
            stmts[nm] = (src, refs)
    # a changed import block can redirect any name — fold the imports
    # into every effective source so import edits stay conservative
    imports_blob = "\n".join(import_srcs)
    out: dict[str, str] = {}
    for name in stmts:
        seen: set[str] = set()
        stack, parts = [name], [imports_blob]
        while stack:
            cur = stack.pop()
            if cur in seen or cur not in stmts:
                continue
            seen.add(cur)
            src, refs = stmts[cur]
            parts.append(src)
            stack.extend(refs)
        out[name] = "\n".join(sorted(parts))
    _EFF_CACHE[text] = out
    return out


def module_names_churned(
    hist_text: str, cur_text: str, used: set[str]
) -> bool:
    """True iff any of ``used`` top-level names (or, when ``used`` is
    empty, ANY name) has a different effective source between the two
    module versions. Parse failure on either side → True."""
    hist = effective_sources(hist_text)
    cur = effective_sources(cur_text)
    if hist is None or cur is None:
        return True
    names = used or (set(hist) | set(cur))
    for n in names:
        h, c = hist.get(n), cur.get(n)
        if h is None and c is None:
            # the name resolves in NEITHER version's effective-source map
            # (bound by a re-exported import, tuple-target assignment, or
            # star import — shapes effective_sources doesn't model). We
            # cannot see churn in it, so assume churn rather than silently
            # reporting "no churn" forever (r10 advice).
            return True
        if h != c:
            return True
    return False


def build_ledger() -> list[dict]:
    from reactionetl_etl_spark.plans.catalog import all_queries

    greens = last_green_rounds()
    boundaries = round_boundary_commits()

    cur_catalog = open(os.path.join(REPO, CATALOG_REL)).read()
    cur_pinned = open(os.path.join(REPO, PINNED_REL)).read()
    cur_blocks = catalog_blocks(cur_catalog)
    cur_pins = pinned_blocks(cur_pinned)

    # per boundary round: historical block texts + changed-file list
    hist_blocks: dict[int, dict[str, str]] = {}
    hist_pins: dict[int, dict[str, str]] = {}
    changed_files: dict[int, set[str]] = {}
    for rnd, sha in boundaries.items():
        try:
            hist_blocks[rnd] = catalog_blocks(_git("show", f"{sha}:{CATALOG_REL}"))
        except subprocess.CalledProcessError:
            hist_blocks[rnd] = {}
        try:
            hist_pins[rnd] = pinned_blocks(_git("show", f"{sha}:{PINNED_REL}"))
        except subprocess.CalledProcessError:
            hist_pins[rnd] = {}
        changed_files[rnd] = set(
            _git("diff", "--name-only", sha, "HEAD").splitlines()
        )

    ledger: list[dict] = []
    module_texts: dict[tuple[int, str], str] = {}
    cur_texts: dict[str, str] = {}

    def _cur_text(dep: str) -> str:
        if dep not in cur_texts:
            path = os.path.join(REPO, dep)
            cur_texts[dep] = open(path).read() if os.path.exists(path) else ""
        return cur_texts[dep]

    def _hist_text(green: int, dep: str) -> str:
        key = (green, dep)
        if key not in module_texts:
            try:
                module_texts[key] = _git("show", f"{boundaries[green]}:{dep}")
            except subprocess.CalledProcessError:
                module_texts[key] = ""
        return module_texts[key]
    for name in all_queries():
        green = greens.get(name, 0)
        rec = {"query": name, "last_green_round": green, "churn": []}
        if green == 0 or green not in hist_blocks:
            rec["rank"] = 0 if green == 0 else 3
            ledger.append(rec)
            continue
        deps = block_module_deps(cur_blocks.get(name, ""))
        direct = []
        if cur_blocks.get(name) != hist_blocks[green].get(name):
            direct.append("catalog-block")
        if cur_pins.get(name) != hist_pins[green].get(name):
            direct.append("pinned-oracle")
        for dep in sorted(set(deps) & changed_files[green]):
            # file changed since the green row — but only count it if a
            # name this block USES (effective source, incl. shared
            # helpers/constants it pulls in) actually changed
            if module_names_churned(_hist_text(green, dep), _cur_text(dep), deps[dep]):
                direct.append(dep)
        shared = []
        for dep in sorted(set(SHARED_FILES) & changed_files[green]):
            if module_names_churned(_hist_text(green, dep), _cur_text(dep), SHARED_FILES[dep]):
                shared.append(dep)
        if direct:
            rec["rank"], rec["churn"] = 1, direct
        elif shared:
            rec["rank"], rec["churn"] = 2, shared
        else:
            rec["rank"] = 3
        ledger.append(rec)

    ledger.sort(key=lambda r: (r["rank"], r["last_green_round"], r["query"]))
    return ledger


def main() -> None:
    ledger = build_ledger()
    if "--json" in sys.argv:
        print(json.dumps(ledger, indent=1))
        return
    if "--write" in sys.argv:
        idx = sys.argv.index("--write")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1].startswith("-"):
            raise SystemExit("usage: verify_ledger.py --write <output.json>")
        # round artifact (r9 verdict item 8): summary counts + the full
        # ledger, so the staleness trend is visible round-over-round
        # without re-running the tool against a historical tree
        path = sys.argv[idx + 1]
        counts: dict[str, int] = {}
        for r in ledger:
            key = f'rank{r["rank"]}'
            counts[key] = counts.get(key, 0) + 1
        with open(path, "w") as fh:
            json.dump(
                {"counts": counts, "n_queries": len(ledger), "ledger": ledger},
                fh,
                indent=1,
            )
        print(f"wrote {path}: {counts}")
        return
    if "--priority" in sys.argv:
        for r in ledger:
            print(f'    "{r["query"]}",')
        return
    counts: dict[int, int] = {}
    for r in ledger:
        counts[r["rank"]] = counts.get(r["rank"], 0) + 1
    for r in ledger:
        churn = ",".join(r["churn"]) if r["churn"] else "-"
        print(f'r{r["last_green_round"]:>2}  rank{r["rank"]}  {r["query"]:<40} {churn}')
    print(
        f"\n{len(ledger)} queries: "
        f'{counts.get(0, 0)} never-verified, {counts.get(1, 0)} direct-churn, '
        f'{counts.get(2, 0)} shared-infra-churn, {counts.get(3, 0)} stale-only',
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
