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
    (simultaneous within a layer).

    Depth reduction (r15, second pass): the analyzer's cost is O(levels ×
    columns) and the OPTIMIZER re-collapses the Project pyramid on every
    execution, so fewer levels help both build and run.  Two lossless
    reductions before generating the statement:

    - a layer's ``drops`` fold into the SAME ``SELECT`` (omitting an
      output column is exactly dropping it — nothing can reference it
      between the two half-levels);
    - layers re-stratify to their earliest safe level (ASAP packing): a
      layer sinks to level L when, for every level M ≥ L already formed,
      it reads nothing M defines or drops AND nothing in any M reads a
      name it defines or drops (conservative word-token scan over the
      SQL text — a false match only prevents a merge).  Each packed
      layer still resolves against exactly the values it did before.
      New-column append ORDER can differ across levels, so a final
      projection restores the original algorithm's column order when
      needed.  Measured on the q26 NSVB DAG: 35 exprs+drops layers
      (~70 nested SELECTs) → 20 levels; the big-call generation cost fell 0.85 → 0.55 s and the q26 rebuild 2.1–2.6 → ~1.9 s."""
    # simulate the UN-packed algorithm's column evolution: the packed
    # form must emit the same names in the same final order
    expected = list(base.columns)
    for exprs, drops in layers:
        if exprs:
            low = {c.lower() for c in expected}
            expected = [
                next((k for k in exprs if k.lower() == c.lower()), c)
                for c in expected
            ] + [k for k in exprs if k.lower() not in low]
        if drops:
            dset = {d.lower() for d in drops}
            expected = [c for c in expected if c.lower() not in dset]

    cur = list(base.columns)
    sql = "SELECT * FROM {__base__}"
    for exprs, drops in _merge_layers(layers):
        dset = {d.lower() for d in drops}
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
                    if match.lower() in dset:
                        continue
                    parts.append(f"({exprs[match]}) AS {_bq(match)}")
                    nxt.append(match)
                else:
                    if c.lower() in dset:
                        continue
                    parts.append(_bq(c))
                    nxt.append(c)
            for k in new_names:
                if k.lower() in dset:
                    continue
                parts.append(f"({exprs[k]}) AS {_bq(k)}")
                nxt.append(k)
            sql = "SELECT " + ", ".join(parts) + " FROM (" + sql + ")"
            cur = nxt
        elif drops:
            cur = [c for c in cur if c.lower() not in dset]
            sql = (
                "SELECT " + ", ".join(_bq(c) for c in cur)
                + " FROM (" + sql + ")"
            )
    if cur != expected:
        sql = (
            "SELECT " + ", ".join(_bq(c) for c in expected)
            + " FROM (" + sql + ")"
        )
    # spark.sql(text, **kwargs) runs the text through PySpark's string
    # Formatter, where a literal '{'/'}' (e.g. a regex quantifier
    # '[0-9]{4}' inside a layer expression) would crash or mis-substitute.
    # Escape every brace the layers contributed, then append the ONE real
    # placeholder — only it reaches the formatter unescaped.
    sql = sql.replace("{", "{{").replace("}", "}}").replace(
        "{{__base__}}", "{__base__}"
    )
    return base.sparkSession.sql(sql, __base__=base)


_IDENT = None  # compiled lazily; helpers imports before re is warm
_BQTOK = None  # `quoted identifier` extractor (`` = escaped backquote)


def _merge_layers(
    layers: list[tuple[dict[str, str], list[str]]],
) -> list[tuple[dict[str, str], list[str]]]:
    """Re-stratify ``(exprs, drops)`` layers to their earliest safe level.

    Scanning existing levels from the last one backwards, a layer may
    move before level M iff (case-insensitively) no identifier token of
    its expression text and none of its defined/dropped names is a name
    M defines or drops, AND none of its defined/dropped names appears as
    a token in M's expressions (a later reader must keep seeing the
    pre-layer value, and a dropped name must stay visible to M).  It
    lands on the earliest level for which every later level passes.
    Token scan treats EVERY word in the SQL text as a potential column
    reference (function names, literals included) — false positives only
    forgo a merge, never change semantics.  That conservativeness only
    holds when every defined/dropped NAME is a plain word token: a name
    like ``a b`` can only be read via backquotes, which the word scan
    fragments, so a real dependency could be missed (a FALSE NEGATIVE →
    unsafe merge).  Guard: backquoted segments are extracted as whole
    tokens, and if any layer defines or drops a non-word name the packing
    is skipped outright (layers return unchanged — correct, just
    unpacked).  All current carbon-DAG names are snake_case, so packing
    stays active where it matters."""
    global _IDENT, _BQTOK
    if _IDENT is None:
        import re

        _IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
        _BQTOK = re.compile(r"`((?:[^`]|``)*)`")
    word_ok = _IDENT.fullmatch
    for exprs, drops in layers:
        for n in list(exprs or ()) + list(drops or ()):
            if not word_ok(n):
                return [
                    (dict(e) if e else {}, list(d) if d else [])
                    for e, d in layers
                ]
    levels: list[tuple[dict[str, str], list[str], set[str], set[str]]] = []
    for exprs, drops in layers:
        exprs = dict(exprs) if exprs else {}
        drops = list(drops) if drops else []
        names = {k.lower() for k in exprs} | {d.lower() for d in drops}
        tokens = {
            t.lower()
            for e in exprs.values()
            for t in _IDENT.findall(e)
        } | {
            m.replace("``", "`").lower()
            for e in exprs.values()
            for m in _BQTOK.findall(e)
        }
        place = len(levels)
        for i in range(len(levels) - 1, -1, -1):
            _, _, mnames, mtokens = levels[i]
            if ((names | tokens) & mnames) or (names & mtokens):
                break
            place = i
        if place == len(levels):
            levels.append((exprs, drops, names, tokens))
        else:
            pe, pd, pnames, ptokens = levels[place]
            pe.update(exprs)
            pd.extend(drops)
            pnames |= names
            ptokens |= tokens
    return [(e, d) for e, d, _, _ in levels]


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
