"""Column-expression library: everything here returns ``pyspark.sql.Column``
objects built purely from JVM-side ``pyspark.sql.functions`` — no Python
UDFs — so every expression stays inside whole-stage codegen.
"""

from aiports_data_warehouse_etl_spark.functions.text_extract import (  # noqa: F401
    airport_city,
    airport_country,
    airport_name,
    carrier_name,
    carrier_shortcut,
)
from aiports_data_warehouse_etl_spark.functions.timecodec import (  # noqa: F401
    hhmm_add_minutes,
    hhmm_to_minute_of_day,
    minute_of_day_to_hhmm,
)
from aiports_data_warehouse_etl_spark.functions.keys import (  # noqa: F401
    first_seen_id,
    with_row_id,
    with_scalable_row_id,
)
