"""Dependency-free lint wall (this image ships no ruff/flake8; CI runs ruff
too, but this keeps the wall enforceable locally).

Python checks: syntax, unused imports, trailing whitespace, tabs in
indentation, and line length > 100 (matches ``[tool.ruff]`` in
pyproject.toml). C++ checks (``native/*.cc``): trailing whitespace, tabs,
line length, CRLF, missing final newline, and bracket balance outside
string/char literals and comments — the locally-enforceable core of the
reference's clang-format gate (``/root/reference/.clang-format``,
``.pre-commit-config.yaml``); a ``.clang-format`` mirroring the same style
is committed for dev machines that have the binary.

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


def _strip_cpp_literals(src: str) -> str:
    """Blank out string/char literals and comments, preserving newlines."""
    out = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in ("'", '"'):
            j = i + 1
            while j < n and src[j] != c:
                j += 2 if src[j] == "\\" else 1
            out.append(c + c)
            i = min(j + 1, n)
        elif src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j == -1 else j
        elif src.startswith("/*", i):
            j = src.find("*/", i + 2)
            seg = src[i:(n if j == -1 else j + 2)]
            out.append("\n" * seg.count("\n"))
            i = n if j == -1 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def lint_cpp_file(path: pathlib.Path):
    problems = []
    raw = path.read_bytes()
    if b"\r" in raw:
        problems.append((0, "CRLF line endings"))
    if raw and not raw.endswith(b"\n"):
        problems.append((0, "missing final newline"))
    src = raw.decode("utf-8")
    for i, line in enumerate(src.splitlines(), 1):
        if line.rstrip() != line:
            problems.append((i, "trailing whitespace"))
        if "\t" in line:
            problems.append((i, "tab character"))
        if len(line) > MAX_LINE:
            problems.append((i, f"line too long ({len(line)} > {MAX_LINE})"))
    stripped = _strip_cpp_literals(src)
    pairs = {")": "(", "]": "[", "}": "{"}
    stack: list[tuple[str, int]] = []
    line_no = 1
    for ch in stripped:
        if ch == "\n":
            line_no += 1
        elif ch in "([{":
            stack.append((ch, line_no))
        elif ch in ")]}":
            if not stack or stack.pop()[0] != pairs[ch]:
                problems.append((line_no, f"unbalanced {ch!r}"))
                break
    if stack:
        problems.append((stack[-1][1], f"unclosed {stack[-1][0]!r}"))
    return problems


def main(argv):
    roots = [pathlib.Path(p) for p in argv[1:]] or [
        pathlib.Path("cartpole_tpu"),
        pathlib.Path("tests"),
        pathlib.Path("scripts"),
        pathlib.Path("examples"),
        pathlib.Path("native"),
        pathlib.Path("bench.py"),
        pathlib.Path("__graft_entry__.py"),
    ]
    files = []
    for r in roots:
        if r.is_file():
            files.append(r)
        else:
            files += sorted(r.rglob("*.py"))
            files += sorted(
                f for ext in ("*.cc", "*.h", "*.hpp") for f in r.rglob(ext))
    n = 0
    for f in files:
        if "_gen.py" in f.name:  # machine-generated modules
            continue
        if "_build" in f.parts or ".jax_cache" in f.parts:
            continue  # build/cache outputs are not repository sources
        checker = lint_cpp_file if f.suffix in (".cc", ".h", ".hpp") else lint_file
        for lineno, msg in checker(f):
            print(f"{f}:{lineno}: {msg}")
            n += 1
    # In-page JavaScript: full-lexer structural gate (scripts/js_check.py;
    # the strongest syntax check available in a node-less image).
    page = pathlib.Path("cartpole_tpu/web/page.py")
    if page.exists():
        import re as _re
        import runpy

        ns = runpy.run_path(str(page))
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "js_check", pathlib.Path(__file__).parent / "js_check.py")
        jsmod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(jsmod)
        for k, block in enumerate(_re.findall(
                r"<script>(.*?)</script>", ns["PAGE_HTML"], _re.DOTALL)):
            for msg in jsmod.lex_check(block, f"page.py<script#{k}>"):
                print(msg)
                n += 1
    if n:
        print(f"\n{n} problem(s)")
        return 1
    print(f"lint OK ({len(files)} files + page js)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
