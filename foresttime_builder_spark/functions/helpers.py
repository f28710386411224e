"""Scalar expression helpers replicating R semantics the pipeline relies on.

R's three-valued logic matches SQL for AND/OR, but several dplyr/base idioms
differ from naive Spark translations:

- ``dplyr::if_else(cond, yes, no, missing=m)`` returns ``m`` (default NA)
  when ``cond`` is NA. Plain ``F.when(cond, yes).otherwise(no)`` returns
  ``no`` for a null condition — usually what ``missing = no`` means, but not
  what the default means. :func:`r_if_else` makes the missing branch
  explicit.
- ``x %in% ys`` is never NA in R (NA %in% ys → FALSE); Spark's ``isin``
  returns null for null input. :func:`r_isin` coalesces to false.

Ecoregion decode ports ``getDivision`` (reference ``R/getDivision.R:7-33``):
PROVINCE strips the trailing subsection code from ``ECOSUBCD`` (length
dependent), DIVISION replaces the province's last character with '0'.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def apply_layers(
    base: DataFrame,
    layers: list[tuple[dict[str, str], list[str]]],
) -> DataFrame:
    """Apply dependency-ordered projection layers of SQL-text expressions.

    ``layers`` is a list of ``(exprs, drops)``: each layer adds/replaces the
    columns in ``exprs`` (SQL text, resolved against the previous layer —
    exactly ``withColumns`` semantics) and then drops the named columns.

    The pyramid is folded into ONE generated nested-``SELECT`` statement
    (explicit column lists, no ``*`` re-expansion) executed with a single
    ``spark.sql(text, __base__=base)`` call.  Classic PySpark analyzes
    EAGERLY on every Dataset transform, so the former one-``withColumns``-
    per-layer form re-ran the analyzer over the deepening ~250-column plan
    once per layer — ~33 ms × 49 layers ≈ 1.6 s of the q26 build, measured
    with cProfile (r15 optimization round: 2.5 s of a 3.0 s build was py4j
    ``recv_into``, 49 ``withColumns`` calls = 1.62 s).  One sql() call pays
    parse + analysis once: q26 build 2.06 → 1.67 s median (interleaved A/B,
    output checksums identical); exec time unchanged — the analyzed plan
    optimizes to the same physical plan, layer-per-Project.  An earlier
    round's nested-CTE attempt measured slower because every CTE level
    re-expanded ``SELECT *``; explicit column lists avoid that.

    Semantics notes (pinned by the carbon-chain oracle gates): replaced
    columns keep their position (withColumns convention) and names match
    case-insensitively, exactly like the session's default resolver; each
    layer's expressions resolve against the PREVIOUS layer only
    (simultaneous within a layer)."""
    cur = list(base.columns)
    sql = "SELECT * FROM {__base__}"
    for exprs, drops in layers:
        if exprs:
            lowmap = {c.lower(): c for c in cur}
            new_names = [k for k in exprs if k.lower() not in lowmap]
            parts = []
            nxt = []
            for c in cur:
                match = next(
                    (k for k in exprs if k.lower() == c.lower()), None
                )
                if match is not None:
                    parts.append(f"({exprs[match]}) AS {_bq(match)}")
                    nxt.append(match)
                else:
                    parts.append(_bq(c))
                    nxt.append(c)
            for k in new_names:
                parts.append(f"({exprs[k]}) AS {_bq(k)}")
                nxt.append(k)
            sql = "SELECT " + ", ".join(parts) + " FROM (" + sql + ")"
            cur = nxt
        if drops:
            dset = {d.lower() for d in drops}
            cur = [c for c in cur if c.lower() not in dset]
            sql = (
                "SELECT " + ", ".join(_bq(c) for c in cur)
                + " FROM (" + sql + ")"
            )
    return base.sparkSession.sql(sql, __base__=base)


def _bq(name: str) -> str:
    """Backquote an identifier for generated SQL."""
    return "`" + name.replace("`", "``") + "`"


def r_if_else(cond: Column, yes, no, missing=None) -> Column:
    """``dplyr::if_else`` with explicit NA-condition branch."""
    yes = yes if isinstance(yes, Column) else F.lit(yes)
    no = no if isinstance(no, Column) else F.lit(no)
    missing = missing if isinstance(missing, Column) else F.lit(missing)
    return F.when(cond.isNull(), missing).when(cond, yes).otherwise(no)


def r_isin(col: Column, values) -> Column:
    """R ``%in%``: null input → false, never null."""
    return F.coalesce(col.isin(*values), F.lit(False))


def get_province(ecosubcd: Column) -> Column:
    """PROVINCE from ECOSUBCD: trim, then drop the trailing 1-3 chars
    depending on length (4 → keep 3; 7 → drop 3; else drop 2)."""
    x = F.trim(ecosubcd)
    n = F.length(x)
    return (
        F.when(n == 0, F.lit(""))
        .when(n == 4, F.substring(x, 1, 3))
        .when(n == 7, x.substr(F.lit(1), n - 3))
        .otherwise(x.substr(F.lit(1), n - 2))
    )


def get_division(ecosubcd: Column) -> Column:
    """DIVISION: the province with its last character replaced by '0'."""
    y = get_province(ecosubcd)
    n = F.length(y)
    return F.when(n != 0, F.concat(y.substr(F.lit(1), n - 1), F.lit("0"))).otherwise(
        F.lit("")
    )
