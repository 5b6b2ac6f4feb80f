"""Dependency-free lint wall (this image ships no ruff/flake8; CI runs ruff
too, but this keeps the wall enforceable locally).

Checks: syntax, unused imports, trailing whitespace, tabs in indentation,
and line length > 100. The line-length limit matches ``[tool.ruff]`` in
pyproject.toml. Reference analog: the pre-commit lint wall of
``/root/reference/.pre-commit-config.yaml``.

Usage: python scripts/lint.py [paths...]   (default: the package + tests)
"""

from __future__ import annotations

import ast
import pathlib
import sys

MAX_LINE = 100

# Names that are imported for side effects or by convention.
ALLOW_UNUSED = {"tests.conftest", "__future__.annotations"}


def _unused_imports(tree: ast.AST, src: str):
    imported: dict[str, tuple[int, str]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = (node.lineno, a.name)
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                name = a.asname or a.name
                imported[name] = (
                    node.lineno, f"{node.module or ''}.{a.name}"
                )
    if not imported:
        return []
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass  # handled through the Name at the root
    # __all__ strings count as uses (re-export surface).
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for elt in ast.walk(node.value):
                        if isinstance(elt, ast.Constant) and isinstance(
                            elt.value, str
                        ):
                            used.add(elt.value)
    out = []
    for name, (lineno, full) in imported.items():
        if name in used or full in ALLOW_UNUSED:
            continue
        # noqa comment on the line disables the check.
        line = src.splitlines()[lineno - 1]
        if "noqa" in line:
            continue
        out.append((lineno, f"unused import: {name}"))
    return out


def lint_file(path: pathlib.Path):
    problems = []
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [(e.lineno or 0, f"syntax error: {e.msg}")]
    if path.name != "__init__.py":  # __init__ imports are re-exports
        problems += _unused_imports(tree, src)
    for i, line in enumerate(src.splitlines(), 1):
        if line.rstrip() != line:
            problems.append((i, "trailing whitespace"))
        if line.startswith("\t") or (
            line[: len(line) - len(line.lstrip())].count("\t") > 0
        ):
            problems.append((i, "tab in indentation"))
        if len(line) > MAX_LINE and "noqa" not in line:
            problems.append((i, f"line too long ({len(line)} > {MAX_LINE})"))
    return problems


def main(argv):
    roots = [pathlib.Path(p) for p in argv[1:]] or [
        pathlib.Path("cartpole_tpu"),
        pathlib.Path("tests"),
        pathlib.Path("scripts"),
        pathlib.Path("examples"),
        pathlib.Path("bench.py"),
        pathlib.Path("__graft_entry__.py"),
    ]
    files = []
    for r in roots:
        if r.is_file():
            files.append(r)
        else:
            files += sorted(r.rglob("*.py"))
    n = 0
    for f in files:
        if "_gen.py" in f.name:  # machine-generated modules
            continue
        for lineno, msg in lint_file(f):
            print(f"{f}:{lineno}: {msg}")
            n += 1
    if n:
        print(f"\n{n} problem(s)")
        return 1
    print(f"lint OK ({len(files)} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
