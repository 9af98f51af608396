from aiports_data_warehouse_etl_spark.sources.io import (  # noqa: F401
    read_csv,
    read_parquet,
    read_testdata,
    write_parquet,
)
from aiports_data_warehouse_etl_spark.sources.registry import TableRegistry  # noqa: F401
