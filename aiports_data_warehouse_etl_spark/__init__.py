"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL (L3ni0/Aiports_data_warehouse_ETL).

Built from scratch, Spark-first: every operator is a pure
``DataFrame -> DataFrame`` function expressed with native
``pyspark.sql.functions`` so Catalyst/Tungsten/AQE pick the physical
strategy. No Python row-at-a-time UDFs on any hot path.

Layout
------
- ``session``    SparkSession factory (AQE, shuffle sizing, UTC).
- ``schemas``    explicit StructTypes for every table (no inference).
- ``sources``    CSV/parquet/JDBC scans + sinks, table registry.
- ``functions``  column-expression library (string extractors, HHMM
                 time codecs, surrogate keys, text metrics).
- ``operators``  relational operators: dim builders, fact assembly,
                 incremental delta merge, data-quality rule engine,
                 dedup family, similarity search.
- ``plans``      end-to-end pipeline drivers (reference + strict modes).
- ``streaming``  Structured Streaming twins of the batch operators.
"""

__version__ = "0.1.0"
