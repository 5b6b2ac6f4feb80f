"""Dependency-free lexer-level JavaScript validator.

This image has NO JavaScript engine or parser of any kind (no node, no
Chrome, no quickjs, no Python JS-parser package — checked exhaustively,
round 5), so the reference's ``node --check``/webpack parse gate
(``/root/reference/.github/workflows/linux.yml:79-92``) cannot be
reproduced bit-for-bit. This checker is the strongest gate writable with
what IS here: a full ECMAScript LEXER (strings, template literals with
nested ``${}``, line/block comments, regex literals via the standard
prev-token heuristic, all bracket kinds) that verifies

- every ``(`` ``[`` ``{`` closes with the matching kind, in order;
- no unterminated string / template / block comment / regex at EOF;
- template-literal ``${ }`` interpolations nest and close;
- no stray closing bracket.

That is exactly the mechanical-syntax-error class (the dropped brace, the
unclosed string, the half-deleted block) most likely to slip into the
~400-line in-page script; it cannot catch grammar-level errors like
``const x = ;`` — ``node --check`` still runs in CI when node exists
(``tests/test_web_frontend.py`` ENV-SKIPs otherwise). Validated against
mutation tests (``tests/test_web_frontend.py::TestJsLexCheck``).

Usage: python scripts/js_check.py [file.js]   (stdin if no file)
Exit 0 clean; 1 with a line-numbered report otherwise.
"""

from __future__ import annotations

import sys

__all__ = ["lex_check"]

_OPEN = {"(": ")", "[": "]", "{": "}"}
_CLOSE = {v: k for k, v in _OPEN.items()}

#: Tokens after which a ``/`` starts a REGEX literal rather than division
#: (the standard lexer heuristic: after operators/keywords a regex may
#: begin; after values/identifiers/closing brackets it is division).
_REGEX_PRECEDERS = {
    "(", "[", "{", ",", ";", ":", "?", "=>", "=", "+=", "-=", "*=", "/=",
    "%=", "**=", "<<=", ">>=", ">>>=", "&=", "^=", "|=", "&&=", "||=",
    "??=", "==", "===", "!=", "!==", "<", ">", "<=", ">=", "+", "-", "*",
    "/", "%", "**", "++", "--", "<<", ">>", ">>>", "&", "|", "^", "!",
    "~", "&&", "||", "??", "return", "typeof", "instanceof", "in", "of",
    "new", "delete", "void", "throw", "case", "do", "else", "yield",
    "await",
}


def lex_check(src: str, name: str = "<js>") -> list[str]:
    """Lex ``src``; return a list of human-readable problems (empty if
    structurally clean)."""
    problems: list[str] = []
    stack: list[tuple[str, int]] = []  # (bracket, line)
    # Template interpolation needs its own nesting discipline: a `}` at
    # interpolation depth 0 of the innermost template resumes the string.
    template_stack: list[int] = []  # brace depth at each `${` entry
    line = 1
    i = 0
    n = len(src)
    prev_token = ""  # last significant token, for the regex heuristic

    def fail(msg: str) -> None:
        problems.append(f"{name}:{line}: {msg}")

    mode: list[str] = ["code"]  # code | template
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if mode[-1] == "code" and c in " \t\r":
            i += 1  # whitespace: skip without clobbering prev_token
            continue
        if mode[-1] == "template":
            if c == "\\":
                i += 2
                continue
            if c == "`":
                mode.pop()
                prev_token = "`str`"
                i += 1
                continue
            if c == "$" and i + 1 < n and src[i + 1] == "{":
                template_stack.append(len(stack))
                stack.append(("{", line))
                mode.append("code")
                prev_token = "{"
                i += 2
                continue
            i += 1
            continue
        # ---- code mode.
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if j < 0:
                fail("unterminated block comment")
                return problems
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c in "'\"":
            quote, start_line = c, line
            i += 1
            while i < n:
                if src[i] == "\\":
                    i += 2
                    continue
                if src[i] == "\n":
                    problems.append(
                        f"{name}:{start_line}: unterminated string literal"
                    )
                    break
                if src[i] == quote:
                    i += 1
                    break
                i += 1
            else:
                problems.append(
                    f"{name}:{start_line}: unterminated string literal"
                )
            prev_token = "'str'"
            continue
        if c == "`":
            mode.append("template")
            i += 1
            continue
        if c == "/" and prev_token in _REGEX_PRECEDERS:
            start_line = line
            i += 1
            in_class = False
            while i < n:
                if src[i] == "\\":
                    i += 2
                    continue
                if src[i] == "\n":
                    problems.append(
                        f"{name}:{start_line}: unterminated regex literal"
                    )
                    break
                if src[i] == "[":
                    in_class = True
                elif src[i] == "]":
                    in_class = False
                elif src[i] == "/" and not in_class:
                    i += 1
                    while i < n and (src[i].isalpha()):  # flags
                        i += 1
                    break
                i += 1
            else:
                problems.append(
                    f"{name}:{start_line}: unterminated regex literal"
                )
            prev_token = "/re/"
            continue
        if c in _OPEN:
            stack.append((c, line))
            prev_token = c
            i += 1
            continue
        if c in _CLOSE:
            if (c == "}" and template_stack
                    and len(stack) - 1 == template_stack[-1]):
                # closes the innermost `${` — back into the template.
                if not stack or stack[-1][0] != "{":
                    fail("mismatched '}' for template interpolation")
                    return problems
                stack.pop()
                template_stack.pop()
                if mode[-1] != "code":
                    fail("internal: mode stack out of sync")
                    return problems
                mode.pop()  # back to template
                i += 1
                continue
            if not stack:
                fail(f"stray {c!r} with no matching {_CLOSE[c]!r}")
                i += 1
                continue
            b, bl = stack.pop()
            if _OPEN[b] != c:
                fail(
                    f"mismatched {c!r}: innermost open is {b!r} "
                    f"from line {bl}"
                )
            prev_token = c
            i += 1
            continue
        if c.isalnum() or c in "_$":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            prev_token = src[i:j]
            i = j
            continue
        # Operators: longest-match from a small set for the heuristic.
        for op_len in (4, 3, 2, 1):
            op = src[i:i + op_len]
            if op in _REGEX_PRECEDERS or op_len == 1:
                prev_token = op
                i += op_len
                break
        continue
    for b, bl in stack:
        problems.append(f"{name}:{bl}: unclosed {b!r}")
    if mode[-1] == "template" or len(mode) > 1:
        problems.append(f"{name}: unterminated template literal")
    return problems


def main() -> int:
    if len(sys.argv) > 1:
        name = sys.argv[1]
        with open(name) as f:
            src = f.read()
    else:
        name, src = "<stdin>", sys.stdin.read()
    problems = lex_check(src, name)
    for p in problems:
        print(p, file=sys.stderr)
    print(f"js_check: {name}: "
          f"{'OK' if not problems else f'{len(problems)} problem(s)'}")
    return 0 if not problems else 1


if __name__ == "__main__":
    raise SystemExit(main())
