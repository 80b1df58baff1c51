"""SQL identifier quoting for selectExpr-built subtrees.

The hot pipeline subtrees are built as SQL strings (selectExpr parses
JVM-side in one py4j call — a measured ~10× construction-cost win over
Column trees), which means caller-supplied column names are
interpolated into SQL text. A name that needs quoting (spaces, dots,
hyphens, reserved words) must be backtick-wrapped or it fails to parse
— or worse, parses as an expression (``a.b`` becomes a struct access).
Spark escapes a literal backtick inside a quoted identifier by
doubling it.
"""

from __future__ import annotations


def bq(name: str) -> str:
    """Backtick-quote a column name for safe SQL-string interpolation."""
    return "`" + name.replace("`", "``") + "`"


def let1(value_expr: str, var: str, body: str) -> str:
    """SQL ``let`` — evaluate ``value_expr`` exactly ONCE per row and
    bind it as lambda variable ``var`` inside ``body``:
    ``element_at(transform(array(x), v -> body), 1)``.

    Why this exists: naming a subexpression as a projected column is
    NOT a guarantee of single evaluation — CollapseProject inlines the
    producing expression into every reference site in the consuming
    projection/filter, and a reference INSIDE a higher-order-function
    lambda re-evaluates it per array element. Two measured instances:
    the tokenizer ``split`` inlined into shingle ``element_at`` calls
    (53.2 s → 1.3 s at 200k docs, 41×) and per-element vector-norm
    recomputes turning O(d) normalizes into O(d²). Lambda variables
    are bound to an evaluated value, so the binding survives any
    optimizer rewrite. Values are bit-identical — same expression,
    same fold — so no oracle hash moves.

    Nest calls for multiple bindings (inner bodies see outer vars).
    """
    return f"element_at(transform(array({value_expr}), {var} -> {body}), 1)"
