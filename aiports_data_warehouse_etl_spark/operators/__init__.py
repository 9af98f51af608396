from aiports_data_warehouse_etl_spark.operators.dims import (  # noqa: F401
    build_dim_air_carriers,
    build_dim_airports,
    build_dim_cancelations,
    build_dim_date,
    build_dim_delays,
    build_dim_time,
)
from aiports_data_warehouse_etl_spark.operators.fact import build_fact_flights  # noqa: F401
from aiports_data_warehouse_etl_spark.operators.merge import delta_merge  # noqa: F401
from aiports_data_warehouse_etl_spark.operators.validation import (  # noqa: F401
    Rule,
    unique_rule,
    validate,
)
