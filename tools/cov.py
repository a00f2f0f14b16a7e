"""Dependency-free line coverage for torchio_tpu via sys.monitoring (PEP 669).

The reference enforces ``coverage fail_under = 100``
(``/root/reference/pyproject.toml:110``); this sandbox has no coverage
wheel, so this tool reimplements the line-coverage measurement on
Python 3.12's zero-overhead monitoring API: every (code, line) LINE
event is recorded once and then disabled, so steady-state cost is near
zero even under the full test suite.

Usage:
    python tools/cov.py [pytest args...] [--fail-under PCT]

Runs pytest in-process under the collector, then prints a per-module
coverage table for ``torchio_tpu/`` and exits non-zero if total
coverage is below --fail-under (default: report only).

The executable-line denominator is derived from ``dis.findlinestarts``
over every code object compiled from each source file — the same
definition coverage.py uses for statement coverage.
"""

from __future__ import annotations

import dis
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PACKAGE = REPO / "torchio_tpu"

# Invoked as `python tools/cov.py`, sys.path[0] is tools/ — make the
# package importable regardless of how the tool is launched.
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

_TOOL = sys.monitoring.COVERAGE_ID
_hits: dict[str, set[int]] = {}
_prefix = str(PACKAGE)


def _on_line(code, line):
    filename = code.co_filename
    if filename.startswith(_prefix):
        _hits.setdefault(filename, set()).add(line)
    # First hit is all coverage needs; disable this exact location.
    return sys.monitoring.DISABLE


def start() -> None:
    sys.monitoring.use_tool_id(_TOOL, "torchio_tpu_cov")
    sys.monitoring.register_callback(
        _TOOL, sys.monitoring.events.LINE, _on_line
    )
    sys.monitoring.set_events(_TOOL, sys.monitoring.events.LINE)


def stop() -> None:
    sys.monitoring.set_events(_TOOL, 0)
    sys.monitoring.free_tool_id(_TOOL)


def _excluded_lines(source: str, path: str) -> set[int]:
    """Lines excluded by ``# pragma: no cover`` — coverage.py semantics
    (the reference's ``fail_under = 100`` gate relies on them): the
    marked line is excluded, and when it opens a block (a def/if/except
    header), so is the whole block. For an ``if`` with an ``else``,
    only the marked branch's body is excluded."""
    import ast

    marked = {
        i + 1
        for i, text in enumerate(source.splitlines())
        if "pragma: no cover" in text
    }
    if not marked:
        return set()
    excluded: set[int] = set(marked)
    try:
        tree = ast.parse(source, path)
    except SyntaxError:
        return excluded
    for node in ast.walk(tree):
        lineno = getattr(node, "lineno", None)
        if lineno not in marked:
            continue
        if isinstance(node, ast.If) and node.orelse:
            end = node.body[-1].end_lineno
        else:
            end = getattr(node, "end_lineno", lineno)
        excluded.update(range(lineno, (end or lineno) + 1))
    return excluded


def executable_lines(path: Path) -> set[int]:
    """All line numbers that carry bytecode in any code object of the
    file, minus ``# pragma: no cover`` exclusions."""
    source = path.read_text()
    try:
        top = compile(source, str(path), "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _offset, line in dis.findlinestarts(code):
            # line 0 is the synthetic RESUME location of every code
            # object (not a source line); counting it deflates every
            # file's coverage by one never-hittable line
            if line:
                lines.add(line)
        for const in code.co_consts:
            if hasattr(const, "co_code"):
                stack.append(const)
    return lines - _excluded_lines(source, str(path))


def report(fail_under: float | None = None, show_missing: str | None = None) -> int:
    rows = []
    total_exec = total_hit = 0
    for path in sorted(PACKAGE.rglob("*.py")):
        exec_lines = executable_lines(path)
        if not exec_lines:
            continue
        hit = _hits.get(str(path), set()) & exec_lines
        total_exec += len(exec_lines)
        total_hit += len(hit)
        pct = 100.0 * len(hit) / len(exec_lines)
        rows.append((str(path.relative_to(REPO)), len(exec_lines), len(hit), pct))

    width = max(len(r[0]) for r in rows) if rows else 20
    print(f"\n{'module':<{width}}  {'lines':>6} {'hit':>6} {'cover':>7}")
    print("-" * (width + 23))
    for name, n_exec, n_hit, pct in rows:
        print(f"{name:<{width}}  {n_exec:>6} {n_hit:>6} {pct:>6.1f}%")
    total_pct = 100.0 * total_hit / total_exec if total_exec else 0.0
    print("-" * (width + 23))
    print(f"{'TOTAL':<{width}}  {total_exec:>6} {total_hit:>6} {total_pct:>6.1f}%")

    if show_missing:
        for path in sorted(PACKAGE.rglob("*.py")):
            # "--missing all" prints every incomplete module
            if show_missing != "all" and show_missing not in str(path):
                continue
            exec_lines = executable_lines(path)
            missing = sorted(exec_lines - _hits.get(str(path), set()))
            if show_missing == "all" and not missing:
                continue
            print(f"\n{path.relative_to(REPO)} missing {len(missing)} lines:")
            print(_compress_ranges(missing))

    if fail_under is not None and total_pct < fail_under:
        print(f"\nFAIL: total coverage {total_pct:.1f}% < {fail_under}%")
        return 1
    return 0


def _compress_ranges(lines: list[int]) -> str:
    """[1,2,3,7,9,10] -> '1-3, 7, 9-10'."""
    if not lines:
        return "(none)"
    parts = []
    start = prev = lines[0]
    for n in lines[1:] + [None]:
        if n is not None and n == prev + 1:
            prev = n
            continue
        parts.append(str(start) if start == prev else f"{start}-{prev}")
        if n is not None:
            start = prev = n
    return ", ".join(parts)


def main(argv: list[str]) -> int:
    fail_under = None
    if "--fail-under" in argv:
        i = argv.index("--fail-under")
        fail_under = float(argv[i + 1])
        del argv[i : i + 2]
    show_missing = None
    if "--missing" in argv:
        i = argv.index("--missing")
        show_missing = argv[i + 1]
        del argv[i : i + 2]

    import pytest

    start()
    try:
        code = pytest.main(argv or ["tests/", "-q", "-x"])
    finally:
        stop()
    if code != 0:
        print(f"pytest exited {code}; coverage report follows anyway")
    rc = report(fail_under, show_missing)
    return rc or int(code)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
