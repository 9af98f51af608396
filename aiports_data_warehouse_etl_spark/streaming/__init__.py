from aiports_data_warehouse_etl_spark.streaming.events import (  # noqa: F401
    session_window_agg,
    stream_tumbling_counts,
    tumbling_window_agg,
)
