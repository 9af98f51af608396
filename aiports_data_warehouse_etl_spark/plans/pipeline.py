"""End-to-end ETL driver (SURVEY.md §3).

The reference's whole Airflow DAG (`dags/extract_and_tranform.py:702-729`)
collapses into one lazy driver program: each curated table is a single
logical plan; 'task boundaries' become nothing (pipelined narrow ops)
or shuffle boundaries. No XCom, no pickling — only shuffles and sinks
cross executors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from aiports_data_warehouse_etl_spark import schemas
from aiports_data_warehouse_etl_spark.operators.dims import (
    build_dim_air_carriers,
    build_dim_airports,
    build_dim_cancelations,
    build_dim_date,
    build_dim_delays,
    build_dim_time,
)
from aiports_data_warehouse_etl_spark.operators.fact import build_fact_flights
from aiports_data_warehouse_etl_spark.operators.merge import delta_merge
from aiports_data_warehouse_etl_spark.operators import validation as V
from aiports_data_warehouse_etl_spark.sources.io import read_csv
from aiports_data_warehouse_etl_spark.sources.registry import TableRegistry


@dataclass
class PipelineResult:
    tables: dict[str, DataFrame]
    reports: dict[str, DataFrame]


def run_pipeline(
    spark: SparkSession,
    airports_csv: str,
    carriers_csv: str,
    flights_csv: str | None,
    out_root: str,
    mode: str = "strict",
    date_cap: int | None = 10,
    write: bool = True,
) -> PipelineResult:
    """Build every curated table; optionally delta-merge to ``out_root``.

    ``flights_csv=None`` builds only the input-independent /
    lookup-only tables (airports, carriers, time).
    """
    registry = TableRegistry(spark, out_root)
    tables: dict[str, DataFrame] = {}

    airports_raw = read_csv(spark, airports_csv, schemas.AIRPORTS_RAW)
    carriers_raw = read_csv(spark, carriers_csv, schemas.AIR_CARRIERS_RAW)

    tables["dim_airports"] = build_dim_airports(airports_raw)
    tables["dim_air_carriers"] = build_dim_air_carriers(carriers_raw)
    tables["dim_time"] = build_dim_time(spark)

    if flights_csv is not None:
        flights_raw = read_csv(spark, flights_csv, schemas.FLIGHTS_RAW)
        tables["dim_date"] = build_dim_date(
            flights_raw, cap=date_cap, strict=(mode == "strict")
        )
        tables["dim_cancelations"] = build_dim_cancelations(flights_raw)
        tables["dim_delays"] = build_dim_delays(flights_raw)
        tables["fact_flights"] = build_fact_flights(
            flights_raw, tables["dim_airports"], tables["dim_date"], mode=mode
        )

    reports = {
        name: V.validate(df, rules)
        for name, df, rules in [
            ("dim_airports", tables["dim_airports"], V.dim_airports_rules()),
            ("dim_air_carriers", tables["dim_air_carriers"], V.dim_air_carriers_rules()),
            ("dim_time", tables["dim_time"], V.dim_time_rules()),
        ]
        + (
            [
                ("dim_date", tables["dim_date"], V.dim_date_rules()),
                ("dim_delays", tables["dim_delays"], V.dim_delays_rules()),
                ("fact_flights", tables["fact_flights"], V.fact_flights_rules()),
            ]
            if flights_csv is not None
            else []
        )
    }

    if write:
        for name, df in tables.items():
            delta_merge(spark, df, registry.path(name), registry.delta_path(name))

    return PipelineResult(tables=tables, reports=reports)
