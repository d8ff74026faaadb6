"""Mechanical enforcement of the driver-window rotation rule (VERDICT r7
item 1): any registered query whose exercised code — the package symbols
its builder calls, the builder itself, or its DuckDB oracle — changed
since the query's last GREEN driver row must sit inside the first-50
window the driver re-verifies this round.

The check is STATELESS — everything derives from git history:

* last green round per query = newest committed ``CORRECTNESS_r*.json``
  whose row for the query passes (rows/schema/hash all non-false, no
  error); its commit snapshot is the code the driver proved.
* each query's **signature** = sha256 over (a) the builder function's
  source segment and every entry-file helper it references,
  transitively; (b) the oracle dict value expression and its referenced
  SQL-string assignments; (c) the docstring-stripped AST dump of every
  package symbol the builder reaches — ``P.foo`` / ``cps.bar`` attribute
  uses and in-function ``from catabra_pandas_spark... import`` are
  resolved through ``__init__`` re-export chains to their defining
  module, then names/attributes/deferred-imports inside each reached
  def/assign/class are followed transitively ACROSS modules (so a
  behavioral edit to ``codecs.py`` flags ``multimodal_*`` queries that
  only import ``multimodal.py``, while a docstring/comment-only edit
  flags nothing).
* the signature is computed twice — from the working tree and from
  ``git show <green-commit>:<file>`` — and a mismatch flags the query.

Symbol-level AST comparison supersedes the coarser per-module
``git log -1 --format=%ct`` timestamp rule the verdict sketched: module
timestamps can't see inside ``__spark_entry__.py`` (it legitimately
changes every round) and over-flag on docstring edits — with 100 queries
and a 50-slot window, module granularity can become unsatisfiable (the
r8 docstring fix to ``intervals.py`` alone would have flagged 20+
queries through the real ``sweep.py -> intervals.py`` helper imports).
Per-module commit info is still printed with ``-v``.

A flagged query OUTSIDE the current window fails the round (exit 1).
``finalize_round.py`` runs this as part of the closing checklist.
Usage: ``python scripts/rotation_check.py [-v]``.
"""

from __future__ import annotations

import ast
import copy
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "catabra_pandas_spark"
ENTRY = "__spark_entry__.py"
WINDOW = 50
WT = "<working-tree>"


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, capture_output=True,
                          text=True).stdout.strip()


def _module_to_file(dotted: str) -> str | None:
    """'catabra_pandas_spark.pipeline.codecs' -> repo-relative file path
    (module file or package __init__.py), None if not package-internal."""
    if not (dotted == PKG or dotted.startswith(PKG + ".")):
        return None
    base = dotted.replace(".", "/")
    for cand in (f"{base}.py", f"{base}/__init__.py"):
        if os.path.exists(os.path.join(REPO, cand)):
            return cand
    return None


def _strip_docstrings(node: ast.AST) -> ast.AST:
    """Deep-copied AST with every docstring removed, so comment/docstring
    edits never count as a behavioral change."""
    node = copy.deepcopy(node)
    for sub in ast.walk(node):
        body = getattr(sub, "body", None)
        if (isinstance(sub, (ast.Module, ast.FunctionDef,
                             ast.AsyncFunctionDef, ast.ClassDef))
                and body and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)):
            sub.body = body[1:] or [ast.Pass()]
    return node


def _dump_sha(node: ast.AST) -> str:
    return hashlib.sha256(
        ast.dump(_strip_docstrings(node)).encode()).hexdigest()


class ModuleIndex:
    """Static view of one package module at one ref: top-level symbol
    defs plus a map of locally bound package-internal imports."""

    def __init__(self, source: str, file: str):
        self.file = file
        self.tree = ast.parse(source)
        # containing package for resolving relative imports: drop the
        # trailing "__init__" for packages AND the module's own name for
        # plain modules — `from .sweep import ...` inside
        # operators/merging.py means operators.sweep
        self.pkg_parts = file[:-3].split("/")[:-1]
        self.defs: dict[str, ast.AST] = {}
        self.imports: dict[str, tuple] = {}  # name -> ("sym",f,n)|("mod",f)
        for node in self.tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                self.defs[node.name] = node
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                targets = (node.targets if isinstance(node, ast.Assign)
                           else [node.target])
                for t in targets:
                    if isinstance(t, ast.Name):
                        self.defs[t.id] = node
            elif isinstance(node, (ast.Import, ast.ImportFrom)):
                self.add_import(node)

    def resolve_from(self, node: ast.ImportFrom) -> str | None:
        if node.level:
            base = self.pkg_parts[:len(self.pkg_parts) - (node.level - 1)]
            dotted = ".".join(base + ([node.module] if node.module else []))
        else:
            dotted = node.module or ""
        return dotted if _module_to_file(dotted) else None

    def add_import(self, node: ast.AST) -> None:
        if isinstance(node, ast.Import):
            for a in node.names:
                f = _module_to_file(a.name)
                if f:
                    self.imports[a.asname or a.name.split(".")[0]] = \
                        ("mod", f)
        elif isinstance(node, ast.ImportFrom):
            dotted = self.resolve_from(node)
            if dotted is None:
                return
            f = _module_to_file(dotted)
            for a in node.names:
                sub = _module_to_file(f"{dotted}.{a.name}")
                local = a.asname or a.name
                if sub:
                    self.imports[local] = ("mod", sub)
                elif f:
                    self.imports[local] = ("sym", f, a.name)


class Resolver:
    """Loads ModuleIndex objects at a git ref (or the working tree) and
    accumulates the transitive symbol-signature parts of any (file,
    symbol) entry point.

    Per-symbol (hash, out-edges) pairs are memoized per ref, so the
    expensive AST work (docstring-strip deepcopy + dump + sha) runs ONCE
    per symbol however many query closures share it; each query's
    closure is then plain set reachability over cached edges.  This took
    the 103-query run from ~90 s to well under 30 s (VERDICT r8 item 7)
    without changing any signature: the closure a depth-first collect
    reaches and the closure reachability over the same edge set reaches
    are identical, cycles included."""

    def __init__(self, ref: str):
        self.ref = ref
        self._mods: dict[str, ModuleIndex | None] = {}
        self._info: dict[tuple, tuple[tuple, tuple]] = {}

    def module(self, file: str) -> ModuleIndex | None:
        if file not in self._mods:
            try:
                if self.ref == WT:
                    src = open(os.path.join(REPO, file)).read()
                else:
                    out = subprocess.run(
                        ["git", "show", f"{self.ref}:{file}"], cwd=REPO,
                        capture_output=True, text=True)
                    if out.returncode != 0:
                        self._mods[file] = None
                        return None
                    src = out.stdout
                self._mods[file] = ModuleIndex(src, file)
            except (OSError, SyntaxError):
                self._mods[file] = None
        return self._mods[file]

    def node_info(self, file: str, name: str) -> tuple[tuple, tuple]:
        """Memoized (signature parts, out-edges) of one (file, symbol):
        the AST hash for a defined symbol, the re-export target for an
        __init__ shim, a <missing> marker otherwise."""
        key = (file, name)
        hit = self._info.get(key)
        if hit is not None:
            return hit
        parts: list[str] = []
        edges: list[tuple[str, str]] = []
        mi = self.module(file)
        if mi is None:
            parts.append(f"{file}:<missing-module>")
        elif name not in mi.defs:
            if name in mi.imports:  # re-export chain (__init__ shims)
                imp = mi.imports[name]
                # ("mod", f) needs a concrete attribute to go further
                edges.append((imp[1], imp[2] if imp[0] == "sym" else name))
            else:
                parts.append(f"{file}:{name}:<missing>")
        else:
            node = mi.defs[name]
            parts.append(f"{file}:{name}:{_dump_sha(node)}")
            edges.extend(self.refs(mi, node))
        self._info[key] = out = (tuple(parts), tuple(edges))
        return out

    def refs(self, mi: ModuleIndex, node: ast.AST) -> list[tuple[str, str]]:
        """Direct (file, symbol) references inside `node`: names /
        module-attribute uses / deferred imports."""
        edges: list[tuple[str, str]] = []
        local_imports = dict(mi.imports)
        for sub in ast.walk(node):
            if isinstance(sub, ast.ImportFrom):
                tmp = ModuleIndex.__new__(ModuleIndex)
                tmp.pkg_parts, tmp.imports = mi.pkg_parts, {}
                tmp.add_import(sub)
                local_imports.update(tmp.imports)
        for sub in ast.walk(node):
            if isinstance(sub, ast.Attribute) and \
                    isinstance(sub.value, ast.Name):
                imp = local_imports.get(sub.value.id)
                if imp and imp[0] == "mod":
                    edges.append((imp[1], sub.attr))
            elif isinstance(sub, ast.Name):
                if sub.id in mi.defs:
                    edges.append((mi.file, sub.id))
                elif sub.id in local_imports:
                    imp = local_imports[sub.id]
                    if imp[0] == "sym":
                        edges.append((imp[1], imp[2]))
        return edges

    def collect(self, file: str, name: str, seen: set, parts: set) -> None:
        """Transitive closure over memoized node_info edges.  Stays
        recursive PER SYMBOL so subclasses can intercept individual
        (file, name) nodes (test_rotation_check relies on that); only
        the AST hashing underneath is cached."""
        key = (file, name)
        if key in seen:
            return
        seen.add(key)
        p, e = self.node_info(file, name)
        parts.update(p)
        for f2, n2 in e:
            self.collect(f2, n2, seen, parts)


class EntryIndex:
    """Parsed view of one __spark_entry__.py version: builder map, oracle
    expression map, entry-level defs and package imports; produces the
    per-query signature against a Resolver at the same ref."""

    def __init__(self, source: str, resolver: Resolver):
        self.source = source
        self.resolver = resolver
        self.mi = ModuleIndex(source, ENTRY)
        self.tree = self.mi.tree
        self.query_builders: dict[str, str] = {}
        self.oracle_exprs: dict[str, ast.AST] = {}
        for fn_name, out, want_name in (("queries", self.query_builders,
                                         True),
                                        ("oracle_sql", self.oracle_exprs,
                                         False)):
            fn = self.mi.defs.get(fn_name)
            if fn is None:
                continue
            for node in ast.walk(fn):
                if isinstance(node, ast.Return) and \
                        isinstance(node.value, ast.Dict):
                    for k, v in zip(node.value.keys, node.value.values):
                        if isinstance(k, ast.Constant):
                            out[k.value] = (v.id if want_name and
                                            isinstance(v, ast.Name) else v)

    def _seg(self, node: ast.AST) -> str:
        return ast.get_source_segment(self.source, node) or ""

    def signature(self, query: str) -> str | None:
        bname = self.query_builders.get(query)
        if bname is None or bname not in self.mi.defs:
            return None
        parts: set[str] = set()
        seen: set = set()

        def entry_walk(node: ast.AST, eseen: set[str]) -> None:
            parts.add("entry::" + hashlib.sha256(
                self._seg(node).encode()).hexdigest())
            local_imports = dict(self.mi.imports)
            for sub in ast.walk(node):
                if isinstance(sub, ast.ImportFrom):
                    tmp = ModuleIndex.__new__(ModuleIndex)
                    tmp.pkg_parts, tmp.imports = self.mi.pkg_parts, {}
                    tmp.add_import(sub)
                    local_imports.update(tmp.imports)
            for sub in ast.walk(node):
                if isinstance(sub, ast.Attribute) and \
                        isinstance(sub.value, ast.Name):
                    imp = local_imports.get(sub.value.id)
                    if imp and imp[0] == "mod":
                        self.resolver.collect(imp[1], sub.attr, seen, parts)
                elif isinstance(sub, ast.Name):
                    if sub.id in self.mi.defs and sub.id not in eseen:
                        eseen.add(sub.id)
                        entry_walk(self.mi.defs[sub.id], eseen)
                    elif sub.id in local_imports:
                        imp = local_imports[sub.id]
                        if imp[0] == "sym":
                            self.resolver.collect(imp[1], imp[2], seen,
                                                  parts)

        entry_walk(self.mi.defs[bname], {bname})
        oexpr = self.oracle_exprs.get(query)
        if oexpr is not None:
            entry_walk(oexpr, {bname})
        return hashlib.sha256(
            "\n".join(sorted(parts)).encode()).hexdigest()


def _row_green(row: dict) -> bool:
    return (row.get("err") in (None, "") and
            row.get("rows_match") is True and
            row.get("schema_match") is not False and
            row.get("hash_match") is not False)


def last_green() -> dict[str, tuple[int, str]]:
    """{query: (round, commit_hash)} of the newest green committed row."""
    out: dict[str, tuple[int, str]] = {}
    for fname in sorted(os.listdir(REPO)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fname)
        if not m:
            continue
        rnd = int(m.group(1))
        commit = _git("log", "--format=%H", "-1", "--", fname)
        if not commit:
            continue  # this round's uncommitted fresh output
        try:
            rows = json.load(open(os.path.join(REPO, fname)))
        except Exception:
            continue
        for q, row in rows.items():
            if _row_green(row) and (q not in out or rnd > out[q][0]):
                out[q] = (rnd, commit)
    return out


def main() -> int:
    verbose = "-v" in sys.argv
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = list(entry.queries())
    window = set(names[:WINDOW])
    cur = EntryIndex(open(os.path.join(REPO, ENTRY)).read(), Resolver(WT))
    greens = last_green()

    old_entries: dict[str, EntryIndex] = {}
    failures, flagged_in_window = [], []
    for q in names:
        reason = None
        if q not in greens:
            reason = "no green driver row yet"
        else:
            rnd, commit = greens[q]
            if commit not in old_entries:
                old_src = _git("show", f"{commit}:{ENTRY}")
                old_entries[commit] = EntryIndex(old_src, Resolver(commit))
            if old_entries[commit].signature(q) != cur.signature(q):
                reason = (f"builder/oracle/package symbols changed since "
                          f"green r{rnd} row ({commit[:8]})")
        if reason is None:
            continue
        (flagged_in_window if q in window else failures).append((q, reason))

    if verbose or failures:
        for q, r in flagged_in_window:
            print(f"[in-window ok] {q}: {r}")
    for q, r in failures:
        print(f"[FAIL] {q} is OUTSIDE the 50-slot window but: {r}")
    print(f"rotation check: {len(names)} queries, "
          f"{len(flagged_in_window)} changed-and-in-window, "
          f"{len(failures)} violations")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
