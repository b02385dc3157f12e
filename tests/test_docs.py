"""Documentation drift guards.

The docs (README.md, docs/API.md, docs/TRAINING.md) name importable symbols,
module paths, CLI entry points, and shipped pretrained artifacts.  These
tests resolve every such mention against the package so renames/removals
fail loudly instead of rotting the docs.
"""
import importlib
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", os.path.join("docs", "API.md"),
        os.path.join("docs", "TRAINING.md"), os.path.join("docs", "BENCH.md"),
        os.path.join("docs", "PARITY.md"), os.path.join("docs", "ROADMAP.md")]


def _read(rel):
    with open(os.path.join(REPO, rel), encoding="utf-8") as f:
        return f.read()


def _all_docs():
    return [(rel, _read(rel)) for rel in DOCS]


def test_doc_import_statements_resolve():
    """Every `from headpose_tpu... import a, b` line shown in a doc must
    execute: the named module exists and exports every named symbol."""
    pat = re.compile(r"^from (headpose_tpu[\w.]*) import ([\w, ]+)$",
                     re.MULTILINE)
    checked = 0
    for rel, text in _all_docs():
        for mod_name, names in pat.findall(text):
            mod = importlib.import_module(mod_name)
            for name in (n.strip() for n in names.split(",") if n.strip()):
                assert hasattr(mod, name), (
                    f"{rel} shows `from {mod_name} import {name}` "
                    f"but {mod_name} has no attribute {name!r}")
                checked += 1
    assert checked >= 6  # the quickstart examples alone name this many


def test_doc_module_paths_import():
    """Every dotted headpose_tpu.* module path mentioned anywhere in the
    docs must be importable (e.g. `python -m headpose_tpu.tools.train_cli`)."""
    pat = re.compile(r"\bheadpose_tpu(?:\.[a-z_][a-z0-9_]*)+\b")
    seen = set()
    for _, text in _all_docs():
        seen.update(pat.findall(text))
    assert seen
    for dotted in sorted(seen):
        # trim trailing attribute segments until a module imports; the full
        # path must then resolve attribute by attribute
        parts = dotted.split(".")
        mod, idx = None, len(parts)
        while idx > 0:
            try:
                mod = importlib.import_module(".".join(parts[:idx]))
                break
            except ImportError:
                idx -= 1
        assert mod is not None, f"docs mention unimportable {dotted}"
        obj = mod
        for attr in parts[idx:]:
            assert hasattr(obj, attr), (
                f"docs mention {dotted} but {'.'.join(parts[:idx])} "
                f"has no attribute {attr!r}")
            obj = getattr(obj, attr)


def test_doc_pretrained_names_exist():
    """Every load_pretrained('name') / `pretrained_models/name` mention must
    correspond to a shipped artifact directory."""
    from headpose_tpu.pretrained import PRETRAINED_DIR

    shipped = {d for d in os.listdir(PRETRAINED_DIR)
               if os.path.isdir(os.path.join(PRETRAINED_DIR, d))}
    pats = [re.compile(r"load_pretrained\(['\"]([\w-]+)['\"]\)"),
            re.compile(r"pretrained_models/([\w-]+)")]
    mentioned = set()
    for _, text in _all_docs():
        for pat in pats:
            mentioned.update(pat.findall(text))
    assert mentioned
    missing = sorted(mentioned - shipped)
    assert not missing, (
        f"docs mention pretrained artifacts that are not shipped: {missing} "
        f"(shipped: {sorted(shipped)})")


def test_cost_evidence_invariants():
    """The serving-cost evidence chain (BENCH.md's drift protocol) must
    keep its structural guarantees: the A/A control exists and is
    unbiased at the many-round median, probe history accumulates instead
    of overwriting, and any stable-window top-level record carries its
    stability flag."""
    import json

    with open(os.path.join(REPO, "docs", "survivors_cost.json")) as f:
        surv = json.load(f)
    aa = surv["direct_pairing_aa"]
    assert len(aa["sessions"]) >= 2, "A/A control needs >=2 sessions"
    for s in aa["sessions"]:
        assert s["rounds"] >= 7
        # every window's median stays within 8% of 1.00 (the worst
        # recorded drift-day session sits at 1.047 — leave real margin,
        # since --aa runs auto-append future drift-day sessions)
        assert abs(s["median_ratio"] - 1.0) < 0.08, s
    # and at least one session proves dead-center capability (<1%)
    assert min(abs(s["median_ratio"] - 1.0) for s in aa["sessions"]) < 0.01
    with open(os.path.join(REPO, "docs",
                           "distilled_serving_cost.json")) as f:
        dist = json.load(f)
    assert len(dist["history"]) >= 2, "probe history must accumulate"
    with open(os.path.join(REPO, "docs", "unified_best_cost.json")) as f:
        best = json.load(f)
    assert best["stable_window"] is True, (
        "the 1.115x headline must stay stable-window-backed — an unstable "
        "re-probe may only append to history, never replace the top level")
    assert best["history"], "per-round best-model re-measures accumulate"


def test_certify_all_manifest_integrity():
    """The one-command evidence regenerator (scripts/certify_all.py,
    CLAUDE.md) must keep a well-formed manifest: unique names, every
    dependency defined BEFORE its dependents, every script file present,
    and --list running clean."""
    import importlib.util
    import subprocess
    import sys

    spec = importlib.util.spec_from_file_location(
        "certify_all", os.path.join(REPO, "scripts", "certify_all.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    names = [m[0] for m in mod.MANIFEST]
    assert len(names) == len(set(names))
    seen = set()
    for name, argv, needs, _ in mod.MANIFEST:
        assert set(needs) <= seen, (name, needs)
        assert os.path.exists(os.path.join(REPO, "scripts", argv[0])), argv
        seen.add(name)
    for rel in mod.GATES:
        assert os.path.exists(os.path.join(REPO, rel)), rel
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "certify_all.py"),
         "--list"], capture_output=True, text=True)
    assert proc.returncode == 0 and "stress" in proc.stdout


def test_doc_script_paths_exist():
    """Every scripts/*.py and docs/*.json artifact a doc cites must exist."""
    pat = re.compile(r"\b(scripts/[\w]+\.py|docs/[\w]+\.json)\b")
    mentioned = set()
    for _, text in _all_docs():
        mentioned.update(pat.findall(text))
    assert mentioned
    missing = [p for p in sorted(mentioned)
               if not os.path.exists(os.path.join(REPO, p))]
    assert not missing, f"docs cite files that do not exist: {missing}"
