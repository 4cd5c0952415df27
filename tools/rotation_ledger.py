"""Rotation-invariant ledger for the driver's 50-query correctness window.

The driver checks only the FIRST 50 entries of ``queries()`` against the
DuckDB oracle each round; the rest are covered only by the local mirror
(``tools/check_entry.py``).  Round 6's verdict found two queries whose
implementations were rewritten AFTER their last hard driver row
(``ann_lsh``, ``dedup_jaccard``) and one that never had a row at all
(``doc_chunks``).  This ledger makes that impossible to repeat:

* ``query_modules()`` derives, from the AST of ``__spark_entry__.py``,
  the set of ``sdvg_spark`` module files implementing each query (the
  function-local imports, plus a fixed generation-engine set for the
  ``gen_*`` queries).
* ``build_ledger()`` records, per query, the last round with a green
  driver row (rows+schema+hash all true in ``CORRECTNESS_r{N}.json``)
  and the sha256 of each implementing module at THAT round's code
  snapshot (the parent commit of the ``round N: verdict`` commit).
* ``tests/test_rotation.py`` enforces the invariant: any query past
  position 50 must have a ledger entry whose module hashes match the
  current working tree.  A rewritten module invalidates the hash, so
  the affected queries must be rotated back into the window until a
  fresh driver row re-certifies them.

Scope note: for the entry file itself (which changes every round for
rotation bookkeeping alone) the ledger hashes only the query's own
``q_*`` function source segment (plus, for ``gen_*`` queries, the
shared GEN_CFG/_GEN_QUERIES/_gen_query block), so rotation edits don't
invalidate unrelated queries while semantic wrapper edits do.  The
``oracle_sql()`` body is out of scope — oracle-only edits don't change
the engine under test.

Regenerate after each round's CORRECTNESS file lands:

    python tools/rotation_ledger.py         # rewrites tools/driver_row_ledger.json
"""

from __future__ import annotations

import ast
import hashlib
import json
import re
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ENTRY = REPO / "__spark_entry__.py"
LEDGER = REPO / "tools" / "driver_row_ledger.json"
WINDOW = 50  # driver evaluates the first 50 queries() entries

# Every gen_* query runs the generation engine end-to-end; one fixed
# module set covers them (config parse -> engine plan -> generator
# expressions -> sequencer/rng kernels -> oracle SQL mirror).
_GEN_MODULES = [
    "sdvg_spark/config/model.py",
    "sdvg_spark/core/rng.py",
    "sdvg_spark/core/sequence.py",
    "sdvg_spark/engine.py",
    "sdvg_spark/generators/locales.py",
    "sdvg_spark/generators/values.py",
    "sdvg_spark/oracle.py",
]


def _module_files(modname: str, names: list[str]) -> list[str]:
    """Resolve `from sdvg_spark.x import y` to repo-relative .py files."""
    base = REPO / modname.replace(".", "/")
    out: list[str] = []
    if base.with_suffix(".py").is_file():
        out.append(str(base.with_suffix(".py").relative_to(REPO)))
    elif base.is_dir():
        hit = False
        for n in names:
            sub = base / f"{n}.py"
            if sub.is_file():
                out.append(str(sub.relative_to(REPO)))
                hit = True
        if not hit:  # re-exported names: hash the whole package
            for sub in sorted(base.glob("*.py")):
                out.append(str(sub.relative_to(REPO)))
    return out


def _entry_text(rev: str | None = None) -> str:
    if rev is None:
        return ENTRY.read_text()
    r = subprocess.run(
        ["git", "show", f"{rev}:__spark_entry__.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    if r.returncode != 0:
        raise RuntimeError(f"git show {rev}:__spark_entry__.py failed")
    return r.stdout


def entry_hashes(rev: str | None = None) -> dict[str, str]:
    """Per-query sha256 of the q_* wrapper source (and the shared
    generation block for gen_* queries) at `rev` (None = working tree)."""
    text = _entry_text(rev)
    tree = ast.parse(text)
    out: dict[str, str] = {}
    segs: dict[str, str] = {}
    gen_parts: list[str] = []
    gen_names: list[str] = []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef):
            if node.name.startswith("q_"):
                segs[node.name] = ast.get_source_segment(text, node) or ""
            elif node.name == "_gen_query":
                gen_parts.append(ast.get_source_segment(text, node) or "")
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id in (
                    "GEN_ROWS",
                    "GEN_CFG",
                    "_GEN_QUERIES",
                ):
                    gen_parts.append(ast.get_source_segment(text, node) or "")
                if isinstance(t, ast.Name) and t.id == "_GEN_QUERIES":
                    gen_names = [
                        k.value for k in node.value.keys if isinstance(k, ast.Constant)
                    ]
    # composed queries hash their own source PLUS every (transitively)
    # referenced q_* wrapper's source — a callee edit must invalidate
    # the composite's certificate too
    calls = _q_call_graph(tree)
    for name, seg in segs.items():
        closure, todo = set(), list(calls.get(name, ()))
        while todo:
            c = todo.pop()
            if c in closure or c == name:
                continue
            closure.add(c)
            todo.extend(calls.get(c, ()))
        blob = seg + "".join(segs.get(c, "") for c in sorted(closure))
        out[name[2:]] = hashlib.sha256(blob.encode()).hexdigest()
    gen_sha = hashlib.sha256("\n".join(gen_parts).encode()).hexdigest()
    for g in gen_names:
        out[g] = gen_sha
    return out


def _q_call_graph(tree: ast.Module) -> dict[str, set[str]]:
    """Intra-file composition: q_* functions referenced (by name) from
    each q_* function's body. A composed query (ann_recall runs the
    ivf/lsh/quantized queries and compares them to brute force) depends
    on everything its callees depend on — without this edge a callee
    rewrite leaves the composite 'certified' by a stale row."""
    defined = {
        n.name for n in tree.body if isinstance(n, ast.FunctionDef)
        if n.name.startswith("q_")
    }
    calls: dict[str, set[str]] = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name.startswith("q_"):
            calls[node.name] = {
                sub.id
                for sub in ast.walk(node)
                if isinstance(sub, ast.Name)
                and sub.id in defined
                and sub.id != node.name
            }
    return calls


def query_modules() -> dict[str, list[str]]:
    tree = ast.parse(ENTRY.read_text())
    by_fn: dict[str, set[str]] = {}
    gen_query_names: list[str] = []
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "_GEN_QUERIES":
                    gen_query_names = [
                        k.value for k in node.value.keys if isinstance(k, ast.Constant)
                    ]
        if isinstance(node, ast.FunctionDef) and node.name.startswith("q_"):
            mods: set[str] = set()
            for sub in ast.walk(node):
                if isinstance(sub, ast.ImportFrom) and sub.module and (
                    sub.module == "sdvg_spark" or sub.module.startswith("sdvg_spark.")
                ):
                    mods.update(
                        _module_files(sub.module, [a.name for a in sub.names])
                    )
            by_fn[node.name[2:]] = mods
    # transitive closure over intra-file q_* composition
    calls = _q_call_graph(tree)
    changed = True
    while changed:
        changed = False
        for fn, callees in calls.items():
            tgt = by_fn.get(fn[2:])
            if tgt is None:
                continue
            for c in callees:
                extra = by_fn.get(c[2:], set()) - tgt
                if extra:
                    tgt.update(extra)
                    changed = True
    out = {k: sorted(v) for k, v in by_fn.items()}
    for g in gen_query_names:
        out[g] = list(_GEN_MODULES)
    return out


def file_hash(relpath: str, rev: str | None = None) -> str | None:
    if rev is None:
        p = REPO / relpath
        if not p.is_file():
            return None
        data = p.read_bytes()
    else:
        r = subprocess.run(
            ["git", "show", f"{rev}:{relpath}"],
            cwd=REPO,
            capture_output=True,
        )
        if r.returncode != 0:
            return None
        data = r.stdout
    return hashlib.sha256(data).hexdigest()


def round_snapshot_revs() -> dict[int, str]:
    """round N -> commit sha of the code state its driver rows certify
    (the parent of the `round N: verdict` commit)."""
    log = subprocess.run(
        ["git", "log", "--format=%H %s"], cwd=REPO, capture_output=True, text=True
    ).stdout
    revs: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subj = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subj)
        if m and int(m.group(1)) not in revs:
            revs[int(m.group(1))] = f"{sha}^"
    return revs


def last_green_rounds() -> dict[str, int]:
    out: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", f.name).group(1))
        rows = json.loads(f.read_text())
        for q, r in rows.items():
            if (
                isinstance(r, dict)
                and r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            ):
                out[q] = max(out.get(q, 0), n)
    return out


def build_ledger() -> dict:
    mods = query_modules()
    greens = last_green_rounds()
    revs = round_snapshot_revs()
    entry_by_rev: dict[str, dict[str, str]] = {}
    ledger: dict[str, dict] = {}
    for q, n in sorted(greens.items()):
        rev = revs.get(n)
        if rev is None:
            continue
        if rev not in entry_by_rev:
            entry_by_rev[rev] = entry_hashes(rev)
        esha = entry_by_rev[rev].get(q)
        if esha is None:  # wrapper didn't exist at that snapshot
            continue
        hashes = {}
        ok = True
        for m in mods.get(q, []):
            h = file_hash(m, rev)
            if h is None:  # module didn't exist at that snapshot
                ok = False
                break
            hashes[m] = h
        if ok:
            ledger[q] = {"round": n, "modules": hashes, "entry_sha": esha}
    return ledger


def main() -> None:
    ledger = build_ledger()
    LEDGER.write_text(json.dumps(ledger, indent=1, sort_keys=True) + "\n")
    print(f"wrote {LEDGER} with {len(ledger)} entries")


if __name__ == "__main__":
    main()
