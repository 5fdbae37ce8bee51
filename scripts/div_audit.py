#!/usr/bin/env python3
"""Zero-denominator audit — the systematic answer to a recurring divergence
class (r6 `ab_experiment_analysis`, r7 `token_zipf_fit`, r8
`daily_revenue_cusum`): Spark's non-ANSI divide yields NULL on /0 while
DuckDB yields ±inf/NaN, so ANY division whose denominator can be zero is a
latent cross-engine value-hash divergence even when today's data never
exercises it.

The audit walks the AST of every query module (plans/, operators/,
streaming/) and collects real division sites: Python ``/`` BinOps, plus
`` / `` occurrences inside SQL string constants (oracles). Each site must
be one of:

- **literal**: denominator is a numeric literal / ``F.lit(number)`` — can
  never be zero;
- **guarded**: ``NULLIF`` (pins /0 to NULL in both engines) or
  ``GREATEST`` clamping appears on the same or an adjacent (±4) line;
- **annotated**: a ``div-safe: <invariant>`` comment (``#`` in Python,
  ``--`` in SQL) within the preceding 4 lines states the invariant that
  makes the denominator non-zero (e.g. "COUNT(*) of a GROUP BY group is
  >= 1", "embeddings are unit-norm by data contract").

Anything else is a violation. ``tests/test_div_audit.py`` runs this on
every commit, so new divisions cannot land unguarded and un-annotated.
"""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "datafusion_impl_spark"
SCAN = ["plans", "operators", "streaming"]

_GUARD = re.compile(r"NULLIF|GREATEST", re.IGNORECASE)
_ANNOT = "div-safe:"
_SQL_MARK = re.compile(r"\bSELECT\b|\bFROM\b")  # uppercase = SQL, not prose
#: division inside SQL text (space-delimited — excludes paths/regex)
_SQL_DIV = re.compile(r" / ")
#: SQL literal denominator: "/ 2", "/ 100.0", "/ 1e6", or a plan-time
#: f-string interpolation of a simple Python name ("/ {_CHUNK_BYTES}.0") —
#: fixed at query-build time, so never a data-dependent zero
_SQL_LIT_DEN = re.compile(
    r"/ \(?(?:-?\d+(?:\.\d+)?(?:[eE]-?\d+)?\b"
    r"|\{(?:float|int)?\(?[A-Za-z_][\w.*() ]*\)?(?:![rs])?\})"
)


def _const_eval(node: ast.expr, consts: dict[str, float]):
    """Evaluate a constant-only arithmetic expression, else None."""
    if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
        return node.value
    if isinstance(node, ast.Name) and node.id in consts:
        return consts[node.id]
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        v = _const_eval(node.operand, consts)
        return None if v is None else -v
    if (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Name)
        and node.func.id in ("float", "int")
        and len(node.args) == 1
    ):
        v = _const_eval(node.args[0], consts)
        return None if v is None else (float(v) if node.func.id == "float" else int(v))
    if isinstance(node, ast.BinOp) and isinstance(
        node.op, (ast.Mult, ast.Add, ast.Sub, ast.Pow, ast.Div)
    ):
        a = _const_eval(node.left, consts)
        b = _const_eval(node.right, consts)
        if a is None or b is None:
            return None
        try:
            return eval(  # noqa: S307 - constants only, by construction
                compile(ast.Expression(node), "<const>", "eval"),
                {"__builtins__": {}},
                dict(consts),
            )
        except Exception:
            return None
    return None


def _collect_consts(tree: ast.AST) -> dict[str, float]:
    """Names assigned exactly once, to a nonzero numeric-literal
    expression — treated as literal denominators (e.g. ``_BAND_US = 10**6``,
    ``day_us = 24 * 3_600_000_000``)."""
    assigns: dict[str, list] = {}
    for node in ast.walk(tree):
        targets = []
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AnnAssign) and node.value is not None:
            targets = [node.target]
        elif isinstance(node, (ast.AugAssign, ast.For, ast.comprehension)):
            t = node.target
            for n in ast.walk(t) if not isinstance(t, ast.Name) else [t]:
                if isinstance(n, ast.Name):
                    assigns.setdefault(n.id, []).append(None)
            continue
        for t in targets:
            for n in ast.walk(t):
                if isinstance(n, ast.Name):
                    assigns.setdefault(n.id, []).append(node.value)
    consts: dict[str, float] = {}
    # two passes so consts defined in terms of consts resolve
    for _ in range(2):
        for name, vals in assigns.items():
            if len(vals) != 1 or vals[0] is None:
                continue
            v = _const_eval(vals[0], consts)
            if v is not None and v != 0:
                consts[name] = v
    return consts


def _is_literal_den(node: ast.expr, consts: dict[str, float]) -> bool:
    """Numeric literal / single-assignment constant name / F.lit(those)."""
    v = _const_eval(node, consts)
    if v is not None:
        return v != 0
    if (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr == "lit"
        and node.args
    ):
        return _is_literal_den(node.args[0], consts)
    return False


def _window_ok(lines: list[str], lineno: int) -> bool:
    """NULLIF/GREATEST guard on ±4 lines, or div-safe annotation above."""
    lo, hi = max(0, lineno - 5), min(len(lines), lineno + 4)
    blob = "\n".join(lines[lo:hi])
    if _GUARD.search(blob):
        return True
    above = "\n".join(lines[lo:lineno])
    cur = lines[lineno - 1] if lineno - 1 < len(lines) else ""
    return _ANNOT in above or _ANNOT in cur


def audit_file(path: Path) -> list[tuple[int, str]]:
    src = path.read_text()
    lines = src.splitlines()
    tree = ast.parse(src)
    sites: list[int] = []

    in_fstring: set[int] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.JoinedStr):
            for child in ast.walk(node):
                if child is not node:
                    in_fstring.add(id(child))

    def _scan_sql(text: str, base: int) -> None:
        if not _SQL_MARK.search(text):
            return
        for off, t in enumerate(text.splitlines()):
            hits = [
                m
                for m in _SQL_DIV.finditer(t)
                if not _SQL_LIT_DEN.match(t[m.start() + 1 :])
            ]
            if hits:
                sites.append(base + off)

    consts = _collect_consts(tree)
    for node in ast.walk(tree):
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.Div):
            if id(node) not in in_fstring and not _is_literal_den(
                node.right, consts
            ):
                sites.append(node.lineno)
        elif isinstance(node, ast.JoinedStr):
            # child Constant linenos are unreliable inside f-strings; scan
            # the raw source segment instead (the {expr} parts' divisions
            # are audited at their own definition sites)
            seg = ast.get_source_segment(src, node)
            if seg is not None:
                _scan_sql(seg, node.lineno)
        elif isinstance(node, ast.Constant) and isinstance(node.value, str):
            if id(node) not in in_fstring:
                _scan_sql(node.value, node.lineno)

    out = []
    for lineno in sorted(set(sites)):
        if not _window_ok(lines, lineno):
            line = lines[lineno - 1] if lineno - 1 < len(lines) else ""
            out.append((lineno, line.rstrip()))
    return out


def main() -> int:
    bad = 0
    for sub in SCAN:
        for path in sorted((ROOT / sub).rglob("*.py")):
            for lineno, line in audit_file(path):
                print(
                    f"{path.relative_to(ROOT.parent)}:{lineno}: "
                    f"{line.strip()[:120]}"
                )
                bad += 1
    print(f"-- {bad} unguarded, un-annotated division site(s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
