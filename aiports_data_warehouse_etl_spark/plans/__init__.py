from aiports_data_warehouse_etl_spark.plans.pipeline import run_pipeline  # noqa: F401
