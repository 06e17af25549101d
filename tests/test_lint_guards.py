"""Source-hygiene lint guards.

Catches the shadowed-duplicate-def defect class (a method defined twice in
one class body: the later silently wins, the earlier is dead code) that bit
``shift``/``diff`` in round 4 and ``autocorr`` in round 5.
"""

from __future__ import annotations

import ast
import pathlib

SRC = pathlib.Path(__file__).resolve().parents[1] / "sdc_spark"


def _duplicate_defs():
    """Yield (file, class, name) for every method name defined more than
    once directly in the same class body (decorated property/setter pairs
    and @overload groups are exempt)."""
    for path in sorted(SRC.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in ast.walk(tree):
            if not isinstance(node, ast.ClassDef):
                continue
            seen: dict[str, list[ast.AST]] = {}
            for item in node.body:
                if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    seen.setdefault(item.name, []).append(item)
            for name, defs in seen.items():
                if len(defs) < 2:
                    continue
                # property/setter/deleter triples and typing.overload
                # stacks legitimately reuse one name
                decos = {
                    d.attr if isinstance(d, ast.Attribute) else getattr(d, "id", None)
                    for fn in defs
                    for d in fn.decorator_list
                }
                if decos & {"setter", "getter", "deleter", "overload"}:
                    continue
                yield (str(path.relative_to(SRC.parent)), node.name, name)


def test_no_shadowed_duplicate_methods():
    dups = list(_duplicate_defs())
    assert dups == [], (
        "duplicate method definitions in one class body (earlier def is "
        f"dead code): {dups}"
    )


def test_no_duplicate_module_level_defs():
    """Same defect class one level up: a module-level function defined
    twice in the same file."""
    bad = []
    for path in sorted(SRC.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        seen: dict[str, int] = {}
        for item in tree.body:
            if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)):
                seen[item.name] = seen.get(item.name, 0) + 1
        bad += [
            (str(path.relative_to(SRC.parent)), n)
            for n, k in seen.items()
            if k > 1
        ]
    assert bad == [], f"duplicate module-level defs: {bad}"
