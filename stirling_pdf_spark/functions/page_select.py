"""Page-selection DSL (reference operator F7).

Reimplements the semantics of Stirling-PDF's page-number parser
(GeneralUtils.java:636-733 DSL, :735-795 implicit-multiplication
sanitizer, :797-830 part handler) from the spec in SURVEY.md §2.4 —
written from scratch, not translated:

  * "all"                -> every page 1..total
  * comma lists          -> "1,3,5"
  * ranges               -> "2-6", open "4-" (to total)
  * n-expressions        -> "2n+1", "3n", "n(n-1)" evaluated for
                            n = 1..total; implicit multiplication is
                            inserted ("2n" -> "2*n", "n(" -> "n*(");
                            results outside 1..total are dropped
  * dedup                -> first-occurrence order preserved
                            (LinkedHashSet semantics)
  * cap                  -> at most max(1000, 3 * total) selections

Driver-side only: the resulting page list is tiny, so the Spark plan
embeds it as a literal array -> `array_contains` / `isin` filter, which
Catalyst pushes down to the scan. Evaluating the DSL distributed would
be pointless work per row.
"""

from __future__ import annotations

import ast
import re

_ALLOWED_NODES = (
    ast.Expression, ast.BinOp, ast.UnaryOp, ast.Constant, ast.Name,
    ast.Load, ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod,
    ast.USub, ast.UAdd,
)
# NOTE: ast.Pow is deliberately NOT allowed — the reference DSL only
# needs +-*/ (GeneralUtils.java:735-795), and '9**9**9**9' evaluated
# per n would be an unbounded-compute DoS in the driver.


def _sanitize_expr(expr: str) -> str:
    """Insert explicit multiplication: '2n'->'2*n', 'n('->'n*(',
    ')n'->')*n', ')('->')*(' , '2('->'2*('."""
    out = re.sub(r"(\d)\s*n", r"\1*n", expr)
    out = re.sub(r"n\s*\(", "n*(", out)
    out = re.sub(r"\)\s*n", ")*n", out)
    out = re.sub(r"\)\s*\(", ")*(", out)
    out = re.sub(r"(\d)\s*\(", r"\1*(", out)
    return out


def _safe_eval(expr: str, n: int) -> int | None:
    try:
        tree = ast.parse(expr, mode="eval")
    except SyntaxError:
        return None
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            return None
        if isinstance(node, ast.Name) and node.id != "n":
            return None
        if isinstance(node, ast.Constant) and not isinstance(node.value, (int, float)):
            return None
    try:
        val = eval(compile(tree, "<dsl>", "eval"), {"__builtins__": {}}, {"n": n})
    except (ZeroDivisionError, OverflowError, ValueError):
        return None
    if isinstance(val, float):
        if not val.is_integer():
            return None
        val = int(val)
    return val


def parse_page_selection(spec: str, total: int) -> list[int]:
    """Parse the DSL into an ordered, deduped list of 1-based pages."""
    cap = max(1000, 3 * total)
    seen: dict[int, None] = {}  # insertion-ordered set

    def add(p: int) -> bool:
        if 1 <= p <= total and p not in seen:
            seen[p] = None
        return len(seen) < cap

    for part in spec.split(","):
        part = part.strip().lower()
        if not part:
            continue
        if part == "all":
            for p in range(1, total + 1):
                if not add(p):
                    return list(seen)
            continue
        if "n" in part:
            expr = _sanitize_expr(part)
            for n in range(1, total + 1):
                val = _safe_eval(expr, n)
                if val is not None and not add(val):
                    return list(seen)
            continue
        m = re.fullmatch(r"(\d+)\s*-\s*(\d*)", part)
        if m:
            lo = int(m.group(1))
            hi = int(m.group(2)) if m.group(2) else total
            for p in range(lo, hi + 1):
                if not add(p):
                    return list(seen)
            continue
        if part.isdigit():
            if not add(int(part)):
                return list(seen)
    return list(seen)
