"""Named-dataset registry (SURVEY.md §2.1 S8).

The reference declares every table (including its ``_new`` delta twin)
as an Airflow ``Dataset`` URI (`dags/extract_and_tranform.py:12-35`).
Spark-side, the registry is a thin mapping name → storage path that
also exposes each table as a temp view, so ``spark.sql`` works against
every registered table and lineage is explicit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from aiports_data_warehouse_etl_spark.sources.io import read_parquet


@dataclass
class TableRegistry:
    spark: SparkSession
    root: str
    tables: dict[str, str] = field(default_factory=dict)

    def path(self, name: str) -> str:
        return self.tables.get(name, f"{self.root}/{name}.parquet")

    def delta_path(self, name: str) -> str:
        """The ``_new`` delta-twin location (ref `:16-35` *_new datasets)."""
        return f"{self.root}/{name}_new.parquet"

    def register(self, name: str, path: str | None = None) -> None:
        self.tables[name] = path or f"{self.root}/{name}.parquet"

    def load(self, name: str) -> DataFrame:
        df = read_parquet(self.spark, self.path(name))
        df.createOrReplaceTempView(name)
        return df

    def register_views(self, sf_dir: str, names: list[str]) -> None:
        """Expose driver testdata tables as SQL views."""
        for n in names:
            self.spark.read.parquet(f"{sf_dir}/{n}.parquet").createOrReplaceTempView(n)
