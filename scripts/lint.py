#!/usr/bin/env python
"""Zero-warning lint tier for `make ci`.

The reference holds its C++ to `-Wall -Wextra -Wpedantic -Werror`
(reference CMakeLists.txt:8); this is the rebuild's equivalent for the
Python tree.  No third-party linter ships in this environment (no
ruff/flake8/pyflakes), so the checks are implemented directly on `ast`:

  F401  unused module-level import
  F541  f-string without placeholders
  F632  `is` comparison against a str/number literal
  F811  function/class redefined in the same scope body
  F841  local assigned and never used (simple single-name targets)
  E722  bare `except:`
  B006  mutable default argument (list/dict/set literal)
  B033  duplicate key in dict literal
  E501  line longer than MAX_LINE columns

A trailing `# noqa` comment suppresses findings on that line, matching
flake8 convention.  Exit status is the number of findings (0 = clean),
so `make lint` fails CI on any warning — the -Werror discipline.
"""

from __future__ import annotations

import ast
import sys
import tokenize
from pathlib import Path

MAX_LINE = 100


def _noqa_lines(path: Path) -> set[int]:
    out = set()
    with tokenize.open(path) as fh:
        try:
            for tok in tokenize.generate_tokens(fh.readline):
                if tok.type == tokenize.COMMENT and "noqa" in tok.string:
                    out.add(tok.start[0])
        except tokenize.TokenError:
            pass
    return out


class _Names(ast.NodeVisitor):
    """Collect every Name load and every attribute-root load in a tree."""

    def __init__(self):
        self.loads: set[str] = set()

    def visit_Name(self, node):
        if isinstance(node.ctx, (ast.Load, ast.Del)):
            self.loads.add(node.id)
        self.generic_visit(node)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def _used_names(tree: ast.AST) -> set[str]:
    v = _Names()
    v.visit(tree)
    # names referenced in __all__ string lists count as used (re-exports)
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets)):
            for el in ast.walk(node.value):
                if isinstance(el, ast.Constant) and isinstance(el.value, str):
                    v.loads.add(el.value)
    return v.loads


def check_unused_imports(tree, path, report):
    if path.name == "__init__.py":
        return  # re-export surface
    used = _used_names(tree)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                if name not in used:
                    report(node.lineno, "F401",
                           f"'{a.asname or a.name}' imported but unused")
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                name = a.asname or a.name
                if name not in used:
                    report(node.lineno, "F401",
                           f"'{name}' imported but unused")


def check_fstrings(tree, path, report):
    # Python 3.12 keeps the component JoinedStr nodes of an implicit
    # concatenation nested inside the merged JoinedStr — only the
    # OUTERMOST node decides whether placeholders exist
    nested = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.JoinedStr):
            for child in ast.walk(node):
                if isinstance(child, ast.JoinedStr) and child is not node:
                    nested.add(id(child))
    for node in ast.walk(tree):
        if isinstance(node, ast.JoinedStr) and id(node) not in nested:
            if not any(isinstance(v, ast.FormattedValue)
                       for v in node.values):
                report(node.lineno, "F541", "f-string without placeholders")


def check_is_literal(tree, path, report):
    for node in ast.walk(tree):
        if isinstance(node, ast.Compare):
            for op, comp in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Is, ast.IsNot)) and \
                        isinstance(comp, ast.Constant) and \
                        isinstance(comp.value, (str, int, float, complex)) \
                        and not isinstance(comp.value, bool):
                    report(node.lineno, "F632",
                           "`is` comparison with a literal")


def check_bare_except(tree, path, report):
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            report(node.lineno, "E722", "bare `except:`")


def check_mutable_defaults(tree, path, report):
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in list(node.args.defaults) + \
                    [d for d in node.args.kw_defaults if d is not None]:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    report(d.lineno, "B006",
                           f"mutable default argument in '{node.name}'")


def check_dup_dict_keys(tree, path, report):
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            seen = set()
            for kn in node.keys:
                if isinstance(kn, ast.Constant):
                    try:
                        key = (type(kn.value).__name__, kn.value)
                    except TypeError:
                        continue
                    if key in seen:
                        report(kn.lineno, "B033",
                               f"duplicate dict key {kn.value!r}")
                    seen.add(key)


def check_redefs(tree, path, report):
    def scan(body, scope):
        defs = {}
        for st in body:
            if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
                prev = defs.get(st.name)
                deco = [ast.unparse(d) for d in st.decorator_list]
                overload = any("overload" in d or "register" in d
                               or "setter" in d or "getter" in d
                               for d in deco)
                if prev is not None and not overload:
                    report(st.lineno, "F811",
                           f"'{st.name}' redefined (previous at line "
                           f"{prev})")
                defs[st.name] = st.lineno
        for st in body:
            if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef,
                               ast.ClassDef)):
                scan(st.body, st.name)

    scan(tree.body, "<module>")


def check_unused_locals(tree, path, report):
    """F841-lite: a simple `name = ...` whose name is never loaded
    anywhere in the function (including nested scopes).  Tuple targets,
    augmented assigns, underscore-prefixed names, and names re-exported
    via `global`/`nonlocal` are skipped — no false positives by
    construction."""
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        used = _used_names(ast.Module(body=fn.body, type_ignores=[]))
        declared_global = set()
        for node in ast.walk(fn):
            if isinstance(node, (ast.Global, ast.Nonlocal)):
                declared_global.update(node.names)
        for node in ast.walk(fn):
            if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                    and isinstance(node.targets[0], ast.Name):
                name = node.targets[0].id
                if name.startswith("_") or name in declared_global:
                    continue
                if name not in used:
                    report(node.lineno, "F841",
                           f"local '{name}' assigned but never used")


def check_line_length(src_lines, path, report):
    for i, line in enumerate(src_lines, 1):
        if len(line.rstrip("\n")) > MAX_LINE:
            report(i, "E501",
                   f"line too long ({len(line.rstrip())} > {MAX_LINE})")


CHECKS = (check_unused_imports, check_fstrings, check_is_literal,
          check_bare_except, check_mutable_defaults, check_dup_dict_keys,
          check_redefs, check_unused_locals)


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
    noqa = _noqa_lines(path)
    findings: list[str] = []

    def report(lineno, code, msg):
        if lineno in noqa:
            return
        findings.append(f"{path}:{lineno}: {code} {msg}")

    for check in CHECKS:
        check(tree, path, report)
    check_line_length(src.splitlines(True), path, report)
    return findings


def main(argv):
    targets = argv[1:] or ["redtime_tpu", "tests", "scripts",
                           "bench.py", "__graft_entry__.py"]
    files: list[Path] = []
    for t in targets:
        p = Path(t)
        if p.is_dir():
            files.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            files.append(p)
    all_findings: list[str] = []
    for f in files:
        all_findings.extend(lint_file(f))
    for line in all_findings:
        print(line)
    n = len(all_findings)
    print(f"lint: {len(files)} files, {n} finding(s)"
          + (" — FAIL" if n else " — clean"), file=sys.stderr)
    return min(n, 125)


if __name__ == "__main__":
    sys.exit(main(sys.argv))
