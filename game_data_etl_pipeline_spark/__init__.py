"""game_data_etl_pipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference pipeline (rush2pranav/game-data-etl-pipeline,
a single-file pandas batch ETL — see SURVEY.md), built Spark-first:

- DataFrame/SQL logical plans, Catalyst/Tungsten physical execution
- Structured Streaming over event streams
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) designed for 100 TB scale

Layout
------
- ``session``    : SparkSession construction (AQE, UTC, Arrow on)
- ``catalog``    : test-fixture table loading / temp-view registration
- ``registry``   : the central query registry (name -> spark fn + oracle SQL)
- ``operators``  : relational operators (scans, joins, aggregates, windows, ...)
- ``functions``  : scalar/array/json function surfaces
- ``etl``        : reference-parity game-data ETL pipeline (extract/transform/load)
- ``streaming``  : Structured Streaming operators over the events table
- ``llmdata``    : dedup / similarity / text-analysis / multimodal operators
"""

from game_data_etl_pipeline_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
