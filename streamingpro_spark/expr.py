"""Tiny expression language for !if/!elif conditions.

The reference compiles conditions with a small typed expression language
(mlsql-lang: external/mlsql-lang/.../gc/ast.scala:637-873 + codegen) —
``:var`` references, literals, comparison/arith, and/or, and a few
functions.  We interpret instead of codegen (SURVEY.md §7 item 6): the
condition is rewritten to a Python expression and evaluated on a
restricted AST (no attribute access, no calls except whitelisted).
"""

from __future__ import annotations

import ast
import re
from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from streamingpro_spark.context import ExecutionContext

_ALLOWED_NODES = (
    ast.Expression, ast.BoolOp, ast.BinOp, ast.UnaryOp, ast.Compare,
    ast.Name, ast.Load, ast.Constant, ast.Call, ast.And, ast.Or, ast.Not,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Mod, ast.FloorDiv,
    ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.USub,
    ast.List, ast.Tuple, ast.In, ast.NotIn, ast.Subscript, ast.Index,
    ast.Slice,
)

_FUNCS: dict[str, Any] = {
    "len": len,
    "split": lambda s, sep=",": str(s).split(sep),
    "int": int,
    "float": float,
    "str": str,
    "upper": lambda s: str(s).upper(),
    "lower": lambda s: str(s).lower(),
    "startsWith": lambda s, p: str(s).startswith(p),
    "endsWith": lambda s, p: str(s).endswith(p),
    "contains": lambda s, p: p in str(s),
}


def _coerce(v: str) -> Any:
    if isinstance(v, str) and v.strip().lower() in ("true", "false"):
        return v.strip().lower() == "true"
    try:
        return int(v)
    except (TypeError, ValueError):
        pass
    try:
        return float(v)
    except (TypeError, ValueError):
        pass
    return v


def evaluate_condition(cond: str, context: "ExecutionContext") -> bool:
    """Evaluate e.g. ``:total > 0 and :name == "abc"``.

    ``:var`` pulls from the script env (numbers auto-coerced);
    ``sql(...)`` is not supported — use ``set x=... where type="sql"``
    first (same recommendation as the reference docs).
    """
    cond = cond.strip()
    if cond.startswith("'''") and cond.endswith("'''"):
        cond = cond[3:-3]
    elif len(cond) >= 2 and cond[0] == cond[-1] and cond[0] in "'\"":
        cond = cond[1:-1]
    names: dict[str, Any] = {}

    # mask string literals FIRST: every later textual rewrite (:var,
    # = → ==, AND/OR/NOT, true/false) must not touch quoted operands —
    # ':s == "a=b"' used to become '__v_s == "a==b"'.  Literal values
    # re-enter the expression as bound names.  "true"/"false" literals
    # coerce to bool (matching env-var coercion, so :flag == "true" and
    # :flag == true both work); other strings stay strings so function
    # args like startsWith(:v, "5") keep their text form.
    def lit_repl(m: re.Match) -> str:
        py = f"__lit_{len(names)}"
        raw = m.group(0)
        try:
            val = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            val = raw[1:-1]
        if isinstance(val, str) and val.strip().lower() in ("true", "false"):
            val = val.strip().lower() == "true"
        names[py] = val
        return py

    py_expr = re.sub(r'"(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\'',
                     lit_repl, cond)

    def repl(m: re.Match) -> str:
        var = m.group(1)
        py = f"__v_{var}"
        raw = context.env.get(var, "")
        names[py] = _coerce(raw)
        return py

    py_expr = re.sub(r":([A-Za-z_][A-Za-z0-9_]*)", repl, py_expr)
    # SQL-style operators → python
    py_expr = re.sub(r"(?<![<>!=])=(?!=)", "==", py_expr)
    py_expr = re.sub(r"\bAND\b", "and", py_expr)
    py_expr = re.sub(r"\bOR\b", "or", py_expr)
    py_expr = re.sub(r"\bNOT\b", "not", py_expr)
    py_expr = re.sub(r"\btrue\b", "True", py_expr)
    py_expr = re.sub(r"\bfalse\b", "False", py_expr)

    try:
        tree = ast.parse(py_expr, mode="eval")
    except SyntaxError as e:
        raise ValueError(f"invalid !if condition {cond!r}: {e.msg}") from None
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise ValueError(f"disallowed syntax in condition: {ast.dump(node)[:60]}")
        if isinstance(node, ast.Call):
            if not isinstance(node.func, ast.Name) or node.func.id not in _FUNCS:
                raise ValueError("only whitelisted functions allowed in conditions")
    env = dict(_FUNCS)
    env.update(names)
    try:
        return bool(eval(compile(tree, "<cond>", "eval"),
                         {"__builtins__": {}}, env))
    except ValueError:
        raise
    except Exception as e:  # NameError (bare name ≠ :var), TypeError, ...
        raise ValueError(
            f"cannot evaluate !if condition {cond!r}: {e} "
            "(script variables need the ':' prefix, e.g. :myvar)") from None
