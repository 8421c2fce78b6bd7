"""Registry-integrity guards (no Spark session needed).

The round-7 landmine this pins down: Python dict literals silently keep
only the LAST entry for a duplicated key, so a query re-registered under
an existing name shadows the original with no error — round 7 spent a
session re-implementing 10 TPC-H shapes that were already registered
before noticing. These checks make that failure loud:

(a) duplicate keys inside each module's QUERIES/ORACLE literals (AST
    level — the runtime dict can't see them),
(b) cross-module name collisions (the ** merge would shadow too),
(c) every _PRIORITY name resolves and the gate head stays exactly 50,
(d) every ORACLE key has a QUERIES twin (an orphan oracle is a typo'd
    name — the query it meant to certify silently runs rows-only),
(e) every registered callable takes (spark, sf_dir).
"""

from __future__ import annotations

import ast
import inspect
from collections import Counter

from cdc_streaming_pipeline_spark import plans
from cdc_streaming_pipeline_spark.plans import analytics, cdc, docs, events

MODULES = [cdc, docs, analytics, events]


def _literal_keys(module, target: str) -> list[str]:
    """Every string key bound into ``target`` in the module source: keys
    of dict literals assigned to it plus subscript-assignments onto it."""
    tree = ast.parse(inspect.getsource(module))
    keys: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if (
                    isinstance(t, ast.Name)
                    and t.id == target
                    and isinstance(node.value, ast.Dict)
                ):
                    keys.extend(
                        k.value
                        for k in node.value.keys
                        if isinstance(k, ast.Constant) and isinstance(k.value, str)
                    )
                if (
                    isinstance(t, ast.Subscript)
                    and isinstance(t.value, ast.Name)
                    and t.value.id == target
                    and isinstance(t.slice, ast.Constant)
                    and isinstance(t.slice.value, str)
                ):
                    keys.append(t.slice.value)
    return keys


def test_no_duplicate_keys_inside_module_literals():
    for module in MODULES:
        for target in ("QUERIES", "ORACLE"):
            keys = _literal_keys(module, target)
            dupes = [k for k, c in Counter(keys).items() if c > 1]
            assert not dupes, f"{module.__name__}.{target} shadows: {dupes}"


def test_no_cross_module_name_collisions():
    for target in ("QUERIES", "ORACLE"):
        seen: dict[str, str] = {}
        for module in MODULES:
            for name in getattr(module, target):
                assert name not in seen, (
                    f"{name} registered in both {seen[name]} and {module.__name__}"
                )
                seen[name] = module.__name__


def test_priority_names_resolve_and_gate_head_is_50():
    assert len(plans._PRIORITY) == len(set(plans._PRIORITY)) == 50
    missing = [n for n in plans._PRIORITY if n not in plans.QUERIES]
    assert not missing, missing
    # the merged registry must preserve every module entry (nothing
    # collapsed by the ** merge)
    assert len(plans.QUERIES) == sum(len(m.QUERIES) for m in MODULES)
    assert list(plans.QUERIES)[:50] == plans._PRIORITY


def test_every_oracle_key_has_a_query():
    orphans = [k for m in MODULES for k in m.ORACLE if k not in plans.QUERIES]
    assert not orphans, f"oracle entries without a query: {orphans}"


def test_query_callables_take_spark_and_sf_dir():
    bad = []
    for name, fn in plans.QUERIES.items():
        try:
            params = inspect.signature(fn).parameters
        except (TypeError, ValueError):  # builtins/partials — still fine
            continue
        required = [
            p
            for p in params.values()
            if p.default is p.empty
            and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        ]
        if len(required) != 2:
            bad.append(name)
    assert not bad, bad


def test_no_duplicate_toplevel_defs_in_package():
    """A duplicated top-level `def` silently shadows the earlier one —
    the round-8 incident: a botched edit left two minhash_lsh_pairs /
    _verify_jaccard definitions in operators/dedup.py and the STALE
    second copies won at import, reverting a measured optimization while
    every test stayed green. AST-scan the whole package."""
    import pathlib

    import cdc_streaming_pipeline_spark as pkg

    root = pathlib.Path(pkg.__file__).parent
    offenders = []
    for py in root.rglob("*.py"):
        tree = ast.parse(py.read_text())
        seen: dict[str, int] = {}
        for node in tree.body:  # top level only — nested/overload-free
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                if node.name in seen:
                    offenders.append(f"{py.name}:{node.lineno} redefines {node.name} (first at {seen[node.name]})")
                seen[node.name] = node.lineno
    assert not offenders, offenders
