"""Property-based tests (hypothesis): the column expressions must agree
with straight-Python reference semantics on arbitrary inputs — not just
the fixtures we thought of."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from aiports_data_warehouse_etl_spark.functions.text_extract import (
    airport_city,
    airport_country,
    airport_name,
    carrier_name,
    carrier_shortcut,
)
from aiports_data_warehouse_etl_spark.functions.timecodec import (
    hhmm_add_minutes,
    hhmm_to_minute_of_day,
)

# -- pure-Python twins of the reference UDFs (ref extract_and_tranform.py:66-116)


def py_airport_name(row):
    if not row or ":" not in row:
        return "Not specified"
    return row.split(":")[-1].strip()


def py_airport_city(row):
    if not row or "," not in row:
        return "Not specified"
    return row.split(",")[0].strip()


def py_airport_country(row):
    if not row or ":" not in row:
        return "Not specified"
    parts = row.split(":")[0].split(",")
    country = parts[1].strip() if len(parts) > 1 else None  # ref would IndexError
    if country is not None and len(country) > 2:
        return country
    return "United States"


def py_carrier_name(row):
    if not row or "," not in row:
        return "Not specified"
    return row.split(",")[0]


def py_carrier_shortcut(row):
    if not row or ":" not in row:
        return "Not specified"
    return row.split(":")[1]


TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters=" ,:.#-"),
    max_size=40,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20))
def test_extractors_match_python_semantics(spark, descs):
    df = spark.createDataFrame([(i, d) for i, d in enumerate(descs)], ["i", "d"])
    col = F.col("d")
    got = {
        r.i: (r.n, r.c, r.co, r.cn, r.cs)
        for r in df.select(
            "i",
            airport_name(col).alias("n"),
            airport_city(col).alias("c"),
            airport_country(col).alias("co"),
            carrier_name(col).alias("cn"),
            carrier_shortcut(col).alias("cs"),
        ).collect()
    }
    for i, d in enumerate(descs):
        expected = (
            py_airport_name(d),
            py_airport_city(d),
            py_airport_country(d),
            py_carrier_name(d),
            py_carrier_shortcut(d),
        )
        assert got[i] == expected, f"input {d!r}: {got[i]} != {expected}"


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=2359), st.integers(min_value=-300, max_value=300)),
        min_size=1,
        max_size=30,
    )
)
def test_hhmm_codecs_match_python_floordiv(spark, pairs):
    df = spark.createDataFrame(
        [(i, t, d) for i, (t, d) in enumerate(pairs)], ["i", "t", "d"]
    )
    got = {
        r.i: (r.m, r.s)
        for r in df.select(
            "i",
            hhmm_to_minute_of_day(F.col("t")).alias("m"),
            hhmm_add_minutes(F.col("t"), F.col("d")).alias("s"),
        ).collect()
    }
    for i, (t, d) in enumerate(pairs):
        # the reference's literal formulas with Python floor-div semantics
        expected = (t % 60 + (t // 100) * 60, t + (d // 60) * 100 + d % 60)
        assert got[i] == expected, f"(t={t}, d={d}): {got[i]} != {expected}"
