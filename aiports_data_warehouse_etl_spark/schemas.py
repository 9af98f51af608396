"""Explicit StructType schemas for every table the engine touches.

The reference infers every schema from CSV (`dags/extract_and_tranform.py:45,51,58`)
and then forces types with casts; we declare them up front (SURVEY.md §1.2) so
scans never mis-type at 100 TB, where a bad inference on one file corrupts a
whole partition.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-domain raw inputs (rawdata/Airports, rawdata/Air Carriers, and the
# 29-column BTS nationwide flights file — layout per SURVEY.md §1.4).
# ---------------------------------------------------------------------------

AIRPORTS_RAW = T.StructType(
    [
        T.StructField("Code", T.StringType(), False),
        T.StructField("Description", T.StringType(), True),
    ]
)

AIR_CARRIERS_RAW = T.StructType(
    [
        T.StructField("Code", T.LongType(), False),
        T.StructField("Description", T.StringType(), True),
    ]
)

FLIGHTS_RAW = T.StructType(
    [
        T.StructField("FL_DATE", T.StringType(), False),
        T.StructField("OP_CARRIER_AIRLINE_ID", T.LongType(), False),
        T.StructField("TAIL_NUM", T.StringType(), True),
        T.StructField("OP_CARRIER_FL_NUM", T.LongType(), True),
        T.StructField("ORIGIN_AIRPORT_ID", T.LongType(), True),
        T.StructField("ORIGIN_AIRPORT_SEQ_ID", T.LongType(), True),
        T.StructField("ORIGIN_CITY_MARKET_ID", T.LongType(), True),
        T.StructField("ORIGIN", T.StringType(), False),
        T.StructField("DEST_AIRPORT_ID", T.LongType(), True),
        T.StructField("DEST_AIRPORT_SEQ_ID", T.LongType(), True),
        T.StructField("DEST_CITY_MARKET_ID", T.LongType(), True),
        T.StructField("DEST", T.StringType(), False),
        T.StructField("CRS_DEP_TIME", T.LongType(), True),
        T.StructField("DEP_TIME", T.DoubleType(), True),
        T.StructField("DEP_DELAY", T.DoubleType(), True),
        T.StructField("DEP_DELAY_NEW", T.DoubleType(), True),
        T.StructField("ARR_TIME", T.DoubleType(), True),
        T.StructField("ARR_DELAY", T.DoubleType(), True),
        T.StructField("ARR_DELAY_NEW", T.DoubleType(), True),
        T.StructField("CANCELLED", T.DoubleType(), True),
        T.StructField("CANCELLATION_CODE", T.StringType(), True),
        T.StructField("CRS_ELAPSED_TIME", T.DoubleType(), True),
        T.StructField("ACTUAL_ELAPSED_TIME", T.DoubleType(), True),
        T.StructField("CARRIER_DELAY", T.DoubleType(), True),
        T.StructField("WEATHER_DELAY", T.DoubleType(), True),
        T.StructField("NAS_DELAY", T.DoubleType(), True),
        T.StructField("SECURITY_DELAY", T.DoubleType(), True),
        T.StructField("LATE_AIRCRAFT_DELAY", T.DoubleType(), True),
        T.StructField("Unnamed: 28", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Curated star-schema outputs (SURVEY.md §1.4).
# ---------------------------------------------------------------------------

DIM_AIRPORTS = T.StructType(
    [
        T.StructField("airport_id_pk", T.LongType(), False),
        T.StructField("airport_code", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("city", T.StringType(), False),
        T.StructField("country", T.StringType(), False),
    ]
)

DIM_AIR_CARRIERS = T.StructType(
    [
        T.StructField("air_carrier_id_pk", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("shortcut", T.StringType(), False),
    ]
)

DIM_DATE = T.StructType(
    [
        T.StructField("date_id_pk", T.LongType(), False),
        T.StructField("day", T.IntegerType(), False),
        T.StructField("month", T.IntegerType(), False),
        T.StructField("year", T.IntegerType(), False),
        T.StructField("is_work_day", T.BooleanType(), False),
        T.StructField("is_weekday", T.BooleanType(), False),  # sic: means "is weekend"
        T.StructField("quarter", T.IntegerType(), False),
        T.StructField("full_date", T.StringType(), False),
    ]
)

DIM_TIME = T.StructType(
    [
        T.StructField("time_id_pk", T.LongType(), False),
        T.StructField("full_time", T.StringType(), False),
        T.StructField("hour", T.IntegerType(), False),
        T.StructField("time_of_the_day", T.StringType(), False),
    ]
)

DIM_CANCELATIONS = T.StructType(
    [
        T.StructField("cancelation_id_pk", T.LongType(), False),
        T.StructField("is_canceled", T.DoubleType(), True),
        T.StructField("cancellation_code", T.StringType(), True),
    ]
)

DELAY_COLS = [
    "carrier_delay",
    "weather_delay",
    "nas_delay",
    "security_delay",
    "late_aircraft_delay",
    "other_type_delay",
]

DIM_DELAYS = T.StructType(
    [T.StructField("delay_id_pk", T.LongType(), False)]
    + [T.StructField(c, T.DoubleType(), False) for c in DELAY_COLS]
)

FACT_FLIGHTS = T.StructType(
    [
        T.StructField("arrival_airport_id_fk", T.LongType(), True),
        T.StructField("destination_airport_id_fk", T.LongType(), True),
        T.StructField("date_id_fk", T.LongType(), True),
        T.StructField("air_carrier_id_fk", T.LongType(), False),
        T.StructField("delay_id_fk", T.LongType(), False),
        T.StructField("departure_time_fk", T.LongType(), False),
        T.StructField("departure_final_time_fk", T.LongType(), False),
        T.StructField("arrival_time_fk", T.LongType(), False),
        T.StructField("arrivel_final_time_fk", T.LongType(), False),  # sic
        T.StructField("departure_delay", T.DoubleType(), True),
        T.StructField("arrival_delay", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/; FIXTURES.md §B).
# ---------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# ---------------------------------------------------------------------------
# Multimodal extension: media table layout (binary payload + typed metadata).
# ---------------------------------------------------------------------------

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)
