"""Static AST lints over the package — no Spark session.

The round-9 regression class: a refactor rewrote a method body to use
``self`` but left a stale ``@staticmethod`` decorator in place
(merge.py ``_dir_weight``), so every call raised NameError at runtime —
uncaught because the surrounding handler expected IO errors, and
invisible to the test run that wasn't executed before committing. An
AST scan catches the whole class in milliseconds at collection time.
"""

from __future__ import annotations

import ast
import os

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "duckdb_streaming_patterns_spark",
)


def _py_files():
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                yield os.path.join(root, f)


def _names_used(node: ast.AST) -> set[str]:
    return {
        n.id for n in ast.walk(node) if isinstance(n, ast.Name)
    }


def test_no_staticmethod_body_references_self_or_cls():
    offenders = []
    for path in _py_files():
        with open(path) as fh:
            tree = ast.parse(fh.read(), filename=path)
        for node in ast.walk(tree):
            if not isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef)
            ):
                continue
            decorators = {
                d.id
                for d in node.decorator_list
                if isinstance(d, ast.Name)
            }
            if "staticmethod" not in decorators:
                continue
            args = {a.arg for a in node.args.args}
            used = _names_used(node) - args
            if "self" in used or "cls" in used:
                offenders.append(
                    f"{os.path.relpath(path, PKG)}:{node.lineno} "
                    f"{node.name}"
                )
    assert not offenders, (
        "staticmethod bodies referencing self/cls (the round-9 "
        f"_dir_weight regression class): {offenders}"
    )


def test_no_method_shadows_self_param_mismatch():
    """Methods (non-static, non-class) must take ``self`` first — a
    decorator-less function inside a class that forgets ``self`` fails
    at call time with the mirror-image arity error."""
    offenders = []
    for path in _py_files():
        with open(path) as fh:
            tree = ast.parse(fh.read(), filename=path)
        for cls in ast.walk(tree):
            if not isinstance(cls, ast.ClassDef):
                continue
            for node in cls.body:
                if not isinstance(
                    node, (ast.FunctionDef, ast.AsyncFunctionDef)
                ):
                    continue
                decorators = {
                    d.id
                    for d in node.decorator_list
                    if isinstance(d, ast.Name)
                }
                if decorators & {"staticmethod", "classmethod"}:
                    continue
                first = node.args.args[0].arg if node.args.args else None
                if first != "self":
                    offenders.append(
                        f"{os.path.relpath(path, PKG)}:{node.lineno} "
                        f"{cls.name}.{node.name} (first arg {first!r})"
                    )
    assert not offenders, f"methods without self: {offenders}"
