"""Star-schema dimension builders (SURVEY.md §2.2, §2.6).

Each builder is a pure ``DataFrame -> DataFrame`` (or generator) using
only native Spark expressions. Surrogate keys follow the reference's
"pandas index" semantics via explicit canonical orderings (see
``functions.keys``). Behavioral parity is asserted against the golden
CSVs in /root/reference/curated/ by tests/test_dims_golden.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aiports_data_warehouse_etl_spark.functions.keys import first_seen_id, with_row_id
from aiports_data_warehouse_etl_spark.functions.text_extract import (
    airport_city,
    airport_country,
    airport_name,
    carrier_name,
    carrier_shortcut,
)


def build_dim_airports(raw: DataFrame) -> DataFrame:
    """dim_airports(airport_id_pk, airport_code, name, city, country).

    Parity with ref `dags/extract_and_tranform.py:63-99`: three string
    extractors, id = input position (input file is Code-ordered, so the
    canonical ordering is ``Code``), rename, project, distinct. The
    reference's ``drop_duplicates`` runs AFTER id assignment, so it
    never removes anything — kept for literal parity, optimized away by
    Catalyst when ids are unique.
    """
    desc = F.col("Description")
    df = raw.select(
        F.col("Code").alias("airport_code"),
        airport_name(desc).alias("name"),
        airport_city(desc).alias("city"),
        airport_country(desc).alias("country"),
    )
    df = with_row_id(df, ["airport_code"], "airport_id_pk")
    return df.select(
        "airport_id_pk", "airport_code", "name", "city", "country"
    ).distinct()


def build_dim_air_carriers(raw: DataFrame) -> DataFrame:
    """dim_air_carriers(air_carrier_id_pk, name, shortcut).

    Parity with ref `:102-124`: the PK is the raw carrier ``Code``
    itself (the wholesale ``df.columns = [...]`` rename at `:122` turns
    Code into air_carrier_id_pk). Name/shortcut extractors keep the
    reference's no-trim semantics.
    """
    desc = F.col("Description")
    return raw.select(
        F.col("Code").cast("long").alias("air_carrier_id_pk"),
        carrier_name(desc).alias("name"),
        carrier_shortcut(desc).alias("shortcut"),
    )


def build_dim_date(
    flights: DataFrame,
    cap: int | None = 10,
    strict: bool = False,
) -> DataFrame:
    """dim_date from distinct FL_DATE strings (ref `:127-191`).

    - id: first-seen order of the date in the input; the reference file
      is date-ordered, so canonical ordering = the date string itself.
    - ``cap``: the reference caps the dim at 10 rows (`:184`); pass
      ``None`` to lift.
    - quarter: reference formula ``int(month/4)+1`` (nonstandard — maps
      Aug→3); ``strict=True`` uses calendar ``F.quarter``.
    - ``is_weekday`` is [sic] the reference's name for *is weekend*.
    """
    dates = flights.select("FL_DATE").distinct()
    dates = with_row_id(dates, ["FL_DATE"], "date_id_pk")
    if cap is not None:
        dates = dates.filter(F.col("date_id_pk") < cap)

    d = F.to_date(F.col("FL_DATE"))
    dow = F.dayofweek(d)  # Sunday=1 .. Saturday=7
    is_weekend = dow.isin(1, 7)
    quarter = (
        F.quarter(d)
        if strict
        else (F.floor(F.month(d) / 4) + 1).cast("int")
    )
    return dates.select(
        "date_id_pk",
        F.dayofmonth(d).alias("day"),
        F.month(d).alias("month"),
        F.year(d).alias("year"),
        (~is_weekend).alias("is_work_day"),
        is_weekend.alias("is_weekday"),
        quarter.alias("quarter"),
        F.col("FL_DATE").alias("full_date"),
    )


def build_dim_time(spark: SparkSession) -> DataFrame:
    """dim_time: all 1,440 minutes of a day (ref `:194-254`).

    Input-independent generator: ``spark.range(0, 1440)`` with
    ``time_id_pk = hour*60 + minute`` (`:227`), zero-padded HH:MM
    (`:230-236`), and the reference's time-of-day buckets (`:206-211`).
    """
    base = spark.range(0, 1440)
    hour = (F.col("id") / 60).cast("int")
    minute = (F.col("id") % 60).cast("int")
    tod = (
        F.when((hour >= 22) | (hour < 6), "night")
        .when(hour < 12, "morning")
        .when(hour < 18, "afternoon")
        .otherwise("evening")
    )
    return base.select(
        F.col("id").cast("long").alias("time_id_pk"),
        F.format_string("%02d:%02d", hour, minute).alias("full_time"),
        hour.alias("hour"),
        tod.alias("time_of_the_day"),
    )


def build_dim_cancelations(flights: DataFrame) -> DataFrame:
    """dim_cancelations (ref `:257-267`): distinct (CANCELLED,
    CANCELLATION_CODE) pairs keyed by first-occurrence position.

    pandas ``drop_duplicates`` keeps the original index labels, and
    ``rename_axis().reset_index()`` materializes them — so the PK is
    the pre-dedup row position of each pair's first appearance.
    Canonical input ordering for the position: (FL_DATE,
    OP_CARRIER_AIRLINE_ID, ORIGIN, DEST, CRS_DEP_TIME) — the natural
    sort of the BTS file.
    """
    order = flight_canonical_order(flights)
    deduped = first_seen_id(
        flights.select(
            *order,
            F.col("CANCELLED").alias("is_canceled"),
            F.col("CANCELLATION_CODE").alias("cancellation_code"),
        ),
        dedup_cols=["is_canceled", "cancellation_code"],
        order_by=order,
        name="cancelation_id_pk",
    )
    return deduped.select("cancelation_id_pk", "is_canceled", "cancellation_code")


DELAY_SOURCE_COLS = [
    "CRS_ELAPSED_TIME",
    "ACTUAL_ELAPSED_TIME",
    "CARRIER_DELAY",
    "WEATHER_DELAY",
    "NAS_DELAY",
    "SECURITY_DELAY",
    "LATE_AIRCRAFT_DELAY",
]


def _delay_exprs() -> list:
    """Shared derivation for dim_delays / fact delay rows (ref `:272-283`):
    cast double → ACTUAL coalesced with CRS → remaining nulls → 0 →
    other_type_delay = ACTUAL - CRS → lowercase renames.
    """
    crs = F.col("CRS_ELAPSED_TIME").cast("double")
    actual = F.coalesce(F.col("ACTUAL_ELAPSED_TIME").cast("double"), crs)
    out = [
        F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c.lower())
        for c in DELAY_SOURCE_COLS[2:]
    ]
    out.append(
        (F.coalesce(actual, F.lit(0.0)) - F.coalesce(crs, F.lit(0.0))).alias(
            "other_type_delay"
        )
    )
    return out


def build_dim_delays(flights: DataFrame) -> DataFrame:
    """dim_delays (ref `:270-289`): derive six delay columns, dedup on
    the full row, PK = first-occurrence position (see cancelations).
    """
    order = flight_canonical_order(flights)
    derived = flights.select(*order, *_delay_exprs())
    delay_cols = [c.lower() for c in DELAY_SOURCE_COLS[2:]] + ["other_type_delay"]
    deduped = first_seen_id(
        derived,
        dedup_cols=delay_cols,
        order_by=order,
        name="delay_id_pk",
    )
    return deduped.select("delay_id_pk", *delay_cols)


def flight_canonical_order(flights: DataFrame) -> list[str]:
    """Canonical ordering standing in for 'input file order' — the BTS
    file is (FL_DATE, carrier, origin) sorted; tie-broken to totality.

    Position-derived keys (cancelations, delays, fact delay_id_fk) are
    deterministic only under a total order, which a distributed engine
    must declare (SURVEY.md §7.4 risk 1).
    """
    candidates = [
        "FL_DATE",
        "OP_CARRIER_AIRLINE_ID",
        "ORIGIN",
        "DEST",
        "CRS_DEP_TIME",
        "OP_CARRIER_FL_NUM",
    ]
    return [c for c in candidates if c in flights.columns]
