"""String-extraction expressions for the airports / air-carriers dims.

Behavioral parity with the reference's five row-wise pandas UDFs
(`dags/extract_and_tranform.py:66-119`), re-expressed as native Spark
column expressions — zero Python UDFs, so they run inside whole-stage
codegen and vectorize at any scale.

Semantics notes (verified against the reference goldens in
/root/reference/curated/):
- defaults are the literal string ``'Not specified'`` when the expected
  delimiter is absent or the input is NULL/empty;
- carrier name keeps NO trim (`:109` does ``split(',')[0]`` only);
- carrier shortcut keeps its leading space (`:116` ``split(':')[1]``);
- country falls back to ``'United States'`` for ≤2-char results
  (state-code heuristic, `:84-87`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NOT_SPECIFIED = "Not specified"


def _has(col: Column, token: str) -> Column:
    return col.isNotNull() & (col != "") & col.contains(token)


def airport_name(desc: Column) -> Column:
    """Text after the last ':', trimmed (ref `:66-70`)."""
    return F.when(
        _has(desc, ":"), F.trim(F.element_at(F.split(desc, ":"), -1))
    ).otherwise(F.lit(NOT_SPECIFIED))


def airport_city(desc: Column) -> Column:
    """Text before the first ',', trimmed (ref `:72-76`)."""
    return F.when(
        _has(desc, ","), F.trim(F.split(desc, ",").getItem(0))
    ).otherwise(F.lit(NOT_SPECIFIED))


def airport_country(desc: Column) -> Column:
    """Token between ',' and ':'; 2-letter state codes → 'United States'
    (ref `:78-87`).
    """
    # F.get (not getItem): NULL on missing index under ANSI mode, so a
    # description with ':' but no ',' falls to the US fallback instead
    # of failing the task (the reference's pandas UDF would crash here).
    country = F.trim(F.get(F.split(F.split(desc, ":").getItem(0), ","), 1))
    return (
        F.when(~_has(desc, ":"), F.lit(NOT_SPECIFIED))
        .when(country.isNotNull() & (F.length(country) > 2), country)
        .otherwise(F.lit("United States"))
    )


def carrier_name(desc: Column) -> Column:
    """Text before the first ',' — untrimmed (ref `:104-109`)."""
    return F.when(_has(desc, ","), F.split(desc, ",").getItem(0)).otherwise(
        F.lit(NOT_SPECIFIED)
    )


def carrier_shortcut(desc: Column) -> Column:
    """Second ':'-token — untrimmed, keeps leading space (ref `:111-116`)."""
    return F.when(_has(desc, ":"), F.get(F.split(desc, ":"), 1)).otherwise(
        F.lit(NOT_SPECIFIED)
    )
