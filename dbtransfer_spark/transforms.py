"""Transform dialect: per-column scalar expressions, compiled to Catalyst.

The reference pushes raw source-dialect SQL into the source database's
SELECT list (P1: /root/reference/internal/migration/mysql/mysql.go:599-618,
postgresql.go:257-274, cassandra.go:549-575) and validates with a keyword
deny-list (postgresql.go:780-799). Our engine standardizes on the Spark SQL
dialect — the full ``pyspark.sql.functions`` library, strictly superseding
the reference's per-database delegation (SURVEY.md §2.4) — and translates
the documented reference-dialect subset (configs/config.yaml:11-21) so
existing configs run unchanged.

Validation is structural: the expression must parse as a single scalar
expression via ``F.expr`` *and* pass the reference's deny-list (defense in
depth; postgresql.go:784-787). Evaluation happens in Tungsten codegen, not
in the source DB — portable across connectors, and at 100 TB the transform
runs on every executor instead of serializing through one DB's CPU.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# postgresql.go:784-787 deny-list, kept verbatim for config parity.
_DENIED = (
    "delete",
    "drop",
    "truncate",
    "alter",
    "create",
    "grant",
    "revoke",
    "execute",
    "function",
    "procedure",
)

# MySQL DATE_FORMAT % tokens → Java SimpleDateFormat-ish Spark patterns
# (configs/config.yaml:17 uses '%Y-%m-%d').
_MYSQL_FMT = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%c": "M",
    "%d": "dd",
    "%e": "d",
    "%H": "HH",
    "%k": "H",
    "%i": "mm",
    "%s": "ss",
    "%S": "ss",
    "%f": "SSSSSS",
    "%p": "a",
    "%W": "EEEE",
    "%a": "EEE",
    "%b": "MMM",
    "%M": "MMMM",
    "%j": "DDD",
    "%T": "HH:mm:ss",
    "%%": "%",
}

_DATE_FORMAT_RE = re.compile(r"(DATE_FORMAT\s*\(.*?,\s*)'([^']*)'(\s*\))", re.IGNORECASE | re.DOTALL)
_IFNULL_RE = re.compile(r"\bIFNULL\s*\(", re.IGNORECASE)
_NOW_RE = re.compile(r"\bNOW\s*\(\s*\)", re.IGNORECASE)
_CURDATE_RE = re.compile(r"\bCURDATE\s*\(\s*\)", re.IGNORECASE)
_GROUP_CONCAT_RE = re.compile(r"\bGROUP_CONCAT\s*\(", re.IGNORECASE)


def translate_format_string(fmt: str) -> str:
    """Translate a MySQL strftime-style format to a Spark datetime pattern."""
    out: list[str] = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            token = fmt[i : i + 2]
            out.append(_MYSQL_FMT.get(token, token[1]))
            i += 2
        else:
            # Literal text in Spark datetime patterns must be quoted if
            # alphabetic; punctuation passes through.
            ch = fmt[i]
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)


def translate_expression(expr: str) -> str:
    """Rewrite documented reference-dialect constructs into Spark SQL.

    Spark already accepts UPPER/LOWER/CONCAT/arithmetic verbatim; only the
    genuinely dialect-divergent pieces need rewriting.
    """
    def _fmt(m: re.Match[str]) -> str:
        return m.group(1) + "'" + translate_format_string(m.group(2)) + "'" + m.group(3)

    out = _DATE_FORMAT_RE.sub(_fmt, expr)
    out = _IFNULL_RE.sub("coalesce(", out)
    out = _NOW_RE.sub("current_timestamp()", out)
    out = _CURDATE_RE.sub("current_date()", out)
    out = _GROUP_CONCAT_RE.sub("listagg(", out)
    return out


class TransformError(ValueError):
    pass


def validate_expression(expr: str) -> None:
    """Structural validation: single scalar expression, no DDL/DML.

    Stronger than the reference's deny-list — ``F.expr`` refuses anything
    that is not an expression — but the deny-list is kept too so configs
    rejected by the reference are rejected here (postgresql.go:780-799).
    """
    lowered = expr.lower()
    for kw in _DENIED:
        if re.search(rf"\b{kw}\b", lowered):
            raise TransformError(f"expression contains potentially dangerous keyword: {kw}")
    if ";" in expr:
        raise TransformError("expression must be a single scalar expression")
    from pyspark.sql import SparkSession

    session = SparkSession.getActiveSession()
    if session is None:
        # No JVM parser available (e.g. pure config validation before the
        # session exists) — the deny-list above still applies; structural
        # parse happens again at plan time.
        return
    try:
        # F.expr is lazy in PySpark 4 (parsed at plan time), so drive the
        # parser explicitly: must be a single *expression*, not a statement.
        parser = session._jsparkSession.sessionState().sqlParser()
        parser.parseExpression(expr)
    except AttributeError:
        return  # Spark Connect: no JVM access; plan-time parse still applies
    except Exception as exc:  # ParseException
        raise TransformError(f"cannot parse expression {expr!r}: {exc}") from exc


def compile_transform(expr: str) -> Column:
    translated = translate_expression(expr)
    validate_expression(translated)
    return F.expr(translated)


def apply_transforms(df: DataFrame, transforms: dict[str, str]) -> DataFrame:
    """Apply ``{column: expression}`` — the reference replaces the column
    in the SELECT list keeping its name/position (mysql.go:599-618)."""
    if not transforms:
        return df
    cols = {col: compile_transform(expr) for col, expr in transforms.items()}
    return df.withColumns(cols)
