#!/usr/bin/env python
"""Self-contained lint gate (the local analogue of the reference's
`cargo fmt --check` + `clippy -D warnings` gate, .github/workflows/rust-lint.yml).

No third-party linters are available in the target image, so this checks a
deliberately small, zero-false-positive set:

  * every file byte-compiles (compileall)
  * no unused imports (module- and function-level)
  * no bare `except:`
  * no tabs in indentation
  * no trailing whitespace

Exit code 1 on any finding — CI-fatal, like `-D warnings`.
"""

from __future__ import annotations

import ast
import compileall
import sys
from pathlib import Path

ROOTS = ["quantization_tpu", "tests", "bench.py", "__graft_entry__.py", "tools",
         "examples"]


def iter_files():
    base = Path(__file__).resolve().parent.parent
    for root in ROOTS:
        p = base / root
        if p.is_file():
            yield p
        else:
            yield from sorted(p.rglob("*.py"))


class ImportTracker(ast.NodeVisitor):
    """Collect imported names and all identifier/attribute usages."""

    def __init__(self):
        self.imports: dict[str, ast.stmt] = {}
        self.used: set[str] = set()

    def visit_Import(self, node):
        for a in node.names:
            name = a.asname or a.name.split(".")[0]
            self.imports[name] = node

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name == "*":
                continue
            self.imports[a.asname or a.name] = node

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def lint_file(path: Path) -> list[str]:
    problems = []
    text = path.read_text()
    for ln, line in enumerate(text.splitlines(), 1):
        stripped = line.rstrip("\n")
        if stripped != stripped.rstrip():
            problems.append(f"{path}:{ln}: trailing whitespace")
        indent = stripped[: len(stripped) - len(stripped.lstrip())]
        if "\t" in indent:
            problems.append(f"{path}:{ln}: tab in indentation")
    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: bare except")
    tracker = ImportTracker()
    tracker.visit(tree)
    # Names can be used in strings (docstring doctest / __all__) — only flag
    # when the identifier appears nowhere in the source text at all beyond
    # its import line, which keeps this check zero-false-positive.
    for name, node in tracker.imports.items():
        if name in tracker.used:
            continue
        if name == "annotations":
            continue
        occurrences = text.count(name)
        import_line = text.splitlines()[node.lineno - 1]
        if occurrences <= import_line.count(name):
            problems.append(f"{path}:{node.lineno}: unused import {name!r}")
    return problems


def main() -> int:
    base = Path(__file__).resolve().parent.parent
    ok = True
    for root in ROOTS:
        p = base / root
        target = str(p)
        if p.is_dir():
            if not compileall.compile_dir(target, quiet=2, force=False):
                ok = False
        elif p.is_file():
            if not compileall.compile_file(target, quiet=2, force=False):
                ok = False
    problems = []
    for f in iter_files():
        problems.extend(lint_file(f))
    for p in problems:
        print(p)
    if problems or not ok:
        print(f"lint: {len(problems)} problem(s)", file=sys.stderr)
        return 1
    print("lint: clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
