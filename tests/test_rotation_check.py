"""Unit tests for scripts/rotation_check.py's static-analysis layer (no
Spark, no git mutation): relative-import resolution, docstring-stripped
AST signatures, and cross-module symbol closure — the machinery that
decides whether a driver query must rotate into the verification window.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import rotation_check as rc  # noqa: E402


def test_relative_import_resolution():
    """A plain module's relative imports resolve against its CONTAINING
    package (the r8 bug: `from .sweep import ...` inside
    operators/merging.py must mean operators.sweep, not
    operators.merging.sweep)."""
    mi = rc.ModuleIndex(
        "from .sweep import sweep_point_in_interval\n"
        "from ..util import as_list\n",
        "catabra_pandas_spark/operators/merging.py")
    assert mi.imports["sweep_point_in_interval"] == (
        "sym", "catabra_pandas_spark/operators/sweep.py",
        "sweep_point_in_interval")
    assert mi.imports["as_list"] == (
        "sym", "catabra_pandas_spark/util.py", "as_list")


def test_package_init_relative_import():
    """Inside a package __init__, level-1 imports resolve against the
    package itself."""
    mi = rc.ModuleIndex(
        "from .layout import zorder_layout\n",
        "catabra_pandas_spark/sources/__init__.py")
    assert mi.imports["zorder_layout"] == (
        "sym", "catabra_pandas_spark/sources/layout.py", "zorder_layout")


def test_submodule_import_binds_module():
    mi = rc.ModuleIndex(
        "from catabra_pandas_spark.pipeline import codecs\n",
        "catabra_pandas_spark/pipeline/multimodal.py")
    assert mi.imports["codecs"] == (
        "mod", "catabra_pandas_spark/pipeline/codecs.py")


def test_docstring_stripping_ignores_doc_edits():
    import ast

    a = ast.parse('def f(x):\n    """doc A"""\n    return x + 1\n').body[0]
    b = ast.parse('def f(x):\n    """doc B, totally different"""\n'
                  '    return x + 1\n').body[0]
    c = ast.parse('def f(x):\n    """doc A"""\n    return x + 2\n').body[0]
    assert rc._dump_sha(a) == rc._dump_sha(b)
    assert rc._dump_sha(a) != rc._dump_sha(c)


def test_resolver_follows_reexport_and_deferred_imports():
    """Working-tree resolver: collecting mp3_metadata from the pipeline
    __init__ re-export reaches the codecs implementation (deferred
    in-function import), so a codecs.py edit flags multimodal queries."""
    r = rc.Resolver(rc.WT)
    parts, seen = set(), set()
    r.collect("catabra_pandas_spark/pipeline/__init__.py", "mp3_metadata",
              seen, parts)
    files = {p.split(":")[0] for p in parts}
    assert "catabra_pandas_spark/pipeline/multimodal.py" in files
    assert "catabra_pandas_spark/pipeline/codecs.py" in files
    # and the codecs tables the probe reads are in the closure
    names = {tuple(p.split(":")[:2]) for p in parts}
    assert ("catabra_pandas_spark/pipeline/codecs.py", "mp3_probe") in names
    assert ("catabra_pandas_spark/pipeline/codecs.py",
            "_MP3_BITRATES") in names


def test_signature_changes_with_package_symbol():
    """EntryIndex signature: stable across identical builds, sensitive to
    a (simulated) package-symbol change via a patched resolver."""
    entry_src = open(os.path.join(rc.REPO, rc.ENTRY)).read()
    cur1 = rc.EntryIndex(entry_src, rc.Resolver(rc.WT))
    cur2 = rc.EntryIndex(entry_src, rc.Resolver(rc.WT))
    sig = cur1.signature("multimodal_mp3")
    assert sig is not None and sig == cur2.signature("multimodal_mp3")

    class Tweaked(rc.Resolver):
        def collect(self, file, name, seen, parts):
            if name == "mp3_probe":
                parts.add("tweaked")
                return
            super().collect(file, name, seen, parts)

    cur3 = rc.EntryIndex(entry_src, Tweaked(rc.WT))
    assert cur3.signature("multimodal_mp3") != sig
    # an unrelated query does not reach mp3_probe, so it is unaffected
    assert cur3.signature("grouped_mode") == cur1.signature("grouped_mode")


def test_row_green_semantics():
    assert rc._row_green({"rows_match": True, "schema_match": True,
                          "hash_match": True, "err": None})
    assert not rc._row_green({"rows_match": False, "schema_match": True,
                              "hash_match": True, "err": None})
    assert not rc._row_green({"rows_match": True, "schema_match": True,
                              "hash_match": True, "err": "boom"})
    # rows-only weaker check (no oracle): hash/schema absent is still green
    assert rc._row_green({"rows_match": True, "err": None})


def test_repo_passes_rotation_check():
    """The committed repo must satisfy its own rotation rule."""
    import subprocess

    res = subprocess.run([sys.executable,
                          os.path.join(rc.REPO, "scripts",
                                       "rotation_check.py")],
                         capture_output=True, text=True)
    assert res.returncode == 0, res.stdout + res.stderr
