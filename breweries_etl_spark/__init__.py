"""breweries_etl_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of the ``rafaelarm2/breweries-etl``
reference pipeline (pandas + delta-rs medallion ETL), re-expressed
Spark-first: declarative DataFrame plans, Catalyst optimization,
partitioned Parquet sinks, and scale extensions (dedup, similarity
search, text analysis, multimodal plumbing) the reference lacks.

Layout:
    config.py     medallion paths + pipeline constants (ref: U/constants.py)
    session.py    SparkSession factory (AQE on, UTC, Arrow)
    schemas.py    declared StructTypes (replaces the reference's inference)
    operators/    transform/aggregate/quality/dedup/similarity/text/...
    sources/      REST-API, JSON-landing, parquet table loaders
    sinks/        parameterized Parquet writers (overwrite/append/partitioned)
    plans/        the medallion pipeline runner (landing→bronze→silver→gold)
    streaming/    Structured Streaming variants over the events table
"""

__version__ = "0.1.0"
