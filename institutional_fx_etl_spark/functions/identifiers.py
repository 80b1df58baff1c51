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
